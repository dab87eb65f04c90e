"""NaN containment under aggressive batched rollouts.

Reference capability map: test/mjx_correctness_test.py:333-383 (TestNaNStress)
— halfcheetah jit(vmap(step)) with randomized extreme initial velocities and
random ctrl every step; qpos/qvel must stay finite for the whole rollout.
mjtpu's containment layer is forward._check_state (reset-on-nonfinite) plus
the safe-div/safe-cholesky clamps, so these rollouts must never leak a NaN
to the caller even when individual envs go ballistic.
"""

import pathlib

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu

HALFCHEETAH = str(
    pathlib.Path(__file__).parent.parent / "mjtpu" / "zoo" / "assets"
    / "halfcheetah.xml"
)


def _rollout(qvel_scale: float, batch: int, nsteps: int, check_every: int):
  mjm = mujoco.MjModel.from_xml_path(HALFCHEETAH)
  m = mjtpu.put_model(mjm)
  rng = np.random.RandomState(42)
  d0 = mjtpu.make_data(m)
  qvel = jnp.asarray(rng.randn(batch, mjm.nv) * qvel_scale)
  d = jax.vmap(lambda v: d0.replace(qvel=v))(qvel)
  step = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))
  for i in range(nsteps):
    ctrl = jnp.asarray(rng.uniform(-1, 1, (batch, mjm.nu)))
    d = d.replace(ctrl=ctrl)
    d = step(m, d)
    if (i + 1) % check_every == 0 or i == nsteps - 1:
      assert bool(jnp.isfinite(d.qpos).all()), f"NaN/inf in qpos at step {i}"
      assert bool(jnp.isfinite(d.qvel).all()), f"NaN/inf in qvel at step {i}"
  return d


def test_halfcheetah_no_nan_vmap():
  """64 envs x 500 steps, moderate random kicks (sigma=2) + random ctrl."""
  _rollout(qvel_scale=2.0, batch=64, nsteps=500, check_every=50)


def test_halfcheetah_no_nan_extreme_vel():
  """16 envs x 200 steps launched at sigma=50 rad/s — far past any
  physical regime; containment must still hold every step."""
  _rollout(qvel_scale=50.0, batch=16, nsteps=200, check_every=1)


def test_nan_injection_recovers():
  """A NaN injected directly into qvel is caught by _check_state: the env
  resets to a finite state within one step instead of poisoning the batch."""
  mjm = mujoco.MjModel.from_xml_path(HALFCHEETAH)
  m = mjtpu.put_model(mjm)
  d0 = mjtpu.make_data(m)
  d = jax.vmap(lambda _: d0)(jnp.arange(4))
  qvel = np.zeros((4, mjm.nv))
  qvel[1, 0] = np.nan
  qvel[3, 2] = 1e12
  d = d.replace(qvel=jnp.asarray(qvel))
  step = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))
  d = step(m, d)
  assert bool(jnp.isfinite(d.qpos).all())
  assert bool(jnp.isfinite(d.qvel).all())
  # the reset counter records exactly the two poisoned envs (NaN + >MAXVAL)
  assert np.asarray(d.nreset).tolist() == [0, 1, 0, 1]
  # healthy steps never bump it
  d = step(m, d)
  assert int(np.asarray(d.nreset).sum()) == 2
