"""Zoo env behavior: registry, reset/step contracts, auto-reset.

Reference capability map: mujoco_torch/test/zoo_reset_test.py (partial-reset
semantics) + zoo/base.py env contracts.  Functional-JAX equivalents: reset
is a pure function of a PRNG key, auto-reset is the jnp.where swap inside
step, dtypes must be preserved through both.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mjtpu.zoo as zoo

ALL_ENVS = [
    "cartpole", "halfcheetah", "hopper", "walker2d", "swimmer", "ant",
    "humanoid", "humanoid_rich", "humanoid_terrain", "satellite",
    "satellite_large",
]


def test_registry_complete():
  assert sorted(zoo.ENVS.keys()) == sorted(ALL_ENVS)


@pytest.fixture(scope="module")
def cartpole():
  return zoo.ENVS["cartpole"]()


def test_reset_step_contract(cartpole):
  env = cartpole
  key = jax.random.PRNGKey(0)
  state = env.reset(key)
  assert state.obs.shape == (env.observation_size,)
  assert state.done.dtype == jnp.bool_
  assert state.reward.shape == ()
  action = jnp.zeros((env.action_size,), state.obs.dtype)
  nxt = jax.jit(env.step)(state, action)
  assert nxt.obs.dtype == state.obs.dtype
  assert nxt.data.qpos.dtype == state.data.qpos.dtype
  assert int(nxt.steps) == 1
  assert np.isfinite(float(nxt.reward))


def test_batched_vmap_reset_step(cartpole):
  env = cartpole
  keys = jax.random.split(jax.random.PRNGKey(1), 8)
  states = jax.vmap(env.reset)(keys)
  assert states.obs.shape == (8, env.observation_size)
  acts = jnp.zeros((8, env.action_size), states.obs.dtype)
  step = jax.jit(jax.vmap(env.step))
  states = step(states, acts)
  assert states.obs.shape == (8, env.observation_size)
  assert np.isfinite(np.asarray(states.reward)).all()
  # envs got distinct reset noise
  assert np.std(np.asarray(states.data.qpos)[:, 0]) > 0


def test_auto_reset_on_done(cartpole):
  """A done env swaps in a fresh noisy state inside step (reference
  zoo/base.py:325-329 fused partial reset)."""
  env = cartpole
  state = env.reset(jax.random.PRNGKey(2))
  # force done via episode-length exhaustion
  state = state.replace(steps=jnp.asarray(env.episode_length, jnp.int32))
  action = jnp.zeros((env.action_size,), state.obs.dtype)
  nxt = jax.jit(env.step)(state, action)
  assert bool(nxt.done)
  assert int(nxt.steps) == 0  # counter cleared by the swap
  # swapped-in state is near qpos0, not the old trajectory continuation
  q0 = np.asarray(env.model.qpos0)
  assert np.abs(np.asarray(nxt.data.qpos) - q0).max() < 5 * env.reset_noise


@pytest.mark.parametrize("name", ALL_ENVS)
def test_env_constructs(name):
  env = zoo.ENVS[name]()
  assert env.action_size >= 0
  assert env.observation_size > 0
