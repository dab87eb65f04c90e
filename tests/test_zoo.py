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
    "satellite_small", "satellite_large",
]

# reference plant sizes to pin (mujoco_torch/zoo/satellite.py:7-22)
_SAT_SPEC = {
    "satellite_large": dict(nq=15, nv=14, nu=8, act=4, obs=23),
    "satellite_small": dict(nq=19, nv=18, nu=12, act=6, obs=31),
}


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
def test_env_rollout_sweep(name):
  """Every registered env: jit reset + 8-step rollout, obs/action shape
  contract, finite reward, episode counter advances (reference
  zoo_reset_test.py runs the same contract over its registry)."""
  env = zoo.ENVS[name]()
  assert env.action_size >= 0
  assert env.observation_size > 0
  state = env.reset(jax.random.PRNGKey(3))
  assert state.obs.shape == (env.observation_size,)
  step = jax.jit(env.step)
  key = jax.random.PRNGKey(4)
  for i in range(8):
    key, sub = jax.random.split(key)
    action = 0.1 * jax.random.normal(sub, (env.action_size,), state.obs.dtype)
    state = step(state, action)
  assert np.isfinite(np.asarray(state.obs)).all()
  assert np.isfinite(float(state.reward))
  assert np.isfinite(np.asarray(state.data.qpos)).all()
  # counter advances; an auto-reset (done fired mid-rollout) clears it
  assert 0 <= int(state.steps) <= 8


@pytest.mark.parametrize("name", sorted(_SAT_SPEC))
def test_satellite_plants(name):
  """Satellite plants match the reference's sizes exactly and the CMG
  gyroscopic path works: with rotors spinning, a gimbal-rate command
  torques the bus (attitude rate appears with zero direct bus actuation).
  Reference: zoo/satellite.py:7-22 (sizes), test plant physics."""
  spec = _SAT_SPEC[name]
  env = zoo.ENVS[name]()
  assert env.mj_model.nq == spec["nq"]
  assert env.mj_model.nv == spec["nv"]
  assert env.mj_model.nu == spec["nu"]
  assert env.action_size == spec["act"]
  assert env.observation_size == spec["obs"]

  state = env.reset(jax.random.PRNGKey(0))
  # rotors were seeded at speed
  rotor_dofs = np.asarray(env._rotor_dofs())
  assert np.allclose(
      np.asarray(state.data.qvel)[rotor_dofs], env.rotor_speed, atol=1.0
  )
  # command all gimbals at max rate: gyroscopic reaction must rotate
  # the bus even though no actuator acts on the free joint
  step = jax.jit(env.step)
  action = jnp.ones((env.action_size,), state.obs.dtype)
  for _ in range(5):
    state = step(state, action)
  omega = np.asarray(state.data.qvel)[3:6]
  assert np.abs(omega).max() > 1e-3, omega
  # never terminates (satellites don't crash)
  assert not bool(state.done)


def test_randomized_model_step(cartpole):
  """The env step's model hook: vmapping a `parallel.randomize` batch gives
  every env its own physics (identical starts + actions must diverge)."""
  from mjtpu import parallel

  env = cartpole
  B = 4
  mass = jnp.tile(jnp.asarray(env.model.body_mass), (B, 1))
  mass = mass.at[:, 1].multiply(jnp.asarray([0.5, 1.0, 1.5, 2.0]))
  mb, axes = parallel.randomize(env.model, {"body_mass": mass})

  state0 = env.reset(jax.random.PRNGKey(7))
  states = jax.vmap(lambda _: state0)(jnp.arange(B))
  acts = jnp.ones((B, env.action_size), state0.obs.dtype)
  step = jax.jit(jax.vmap(env.step, in_axes=(0, 0, axes)))
  for _ in range(5):
    states = step(states, acts, mb)
  assert np.isfinite(np.asarray(states.obs)).all()
  # heavier carts accelerate less under the same push
  xs = np.asarray(states.data.qpos)[:, 0]
  assert np.std(xs) > 1e-5, xs
  assert np.all(np.diff(xs) < 0), f"x should fall with mass: {xs}"

  # passing the env's own model explicitly is the identity
  ref = env.step(state0, jnp.ones((env.action_size,), state0.obs.dtype))
  exp = env.step(
      state0, jnp.ones((env.action_size,), state0.obs.dtype), env.model
  )
  np.testing.assert_array_equal(
      np.asarray(ref.data.qpos), np.asarray(exp.data.qpos)
  )


def test_satellite_pixel_obs():
  """Pixel observations render through the env pipeline (scene lights)."""
  env = zoo.ENVS["satellite_small"](pixel_obs=True, pixel_size=(24, 32))
  state = env.reset(jax.random.PRNGKey(0))
  px = np.asarray(state.pixels)
  assert px.shape == (24, 32, 3)
  assert np.isfinite(px).all() and px.max() <= 1.0 and px.min() >= 0.0
  assert px.std() > 0.01  # an actual image, not a constant fill
