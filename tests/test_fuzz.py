"""Fuzzed-MJCF trajectory parity vs MuJoCo C (reference test strategy:
test_util.create_mjcf seeds feeding per-stage/trajectory oracles,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu
from mjtpu._src.test_util import create_mjcf


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_trajectory(seed):
  # sphere/capsule primitives have bit-exact narrowphase vs C; box SAT
  # differs from mj's analytic box colliders in deep corner penetration
  # (same as MJX), so boxes get the stability fuzz below instead
  xml = create_mjcf(
      seed,
      frictionloss=(seed % 2 == 0),
      tendons=(seed % 3 == 0),
      geom_types=("sphere", "capsule"),
  )
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.05, 0.05, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.1, 0.1, mjm.nv)
  try:
    m = mjtpu.put_model(mjm)
  except NotImplementedError as e:
    pytest.skip(f"unsupported fuzz feature: {e}")
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  step = jax.jit(mjtpu.step)
  for i in range(50):
    if mjm.nu:
      c = rng.uniform(-1, 1, mjm.nu)
      mjd.ctrl[:] = c
      d = d.replace(ctrl=jnp.asarray(np.array(c)))
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    err = max(
        np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
        np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
    )
    assert err < 1e-6, f"fuzz seed {seed} diverged at step {i}: {err:.3e}"


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_boxes_stable(seed):
  """Box-heavy fuzz models: assert bounded, finite dynamics (narrowphase
  corner cases legitimately differ from mj's analytic box colliders)."""
  xml = create_mjcf(seed + 100, geom_types=("box", "sphere"))
  mjm = mujoco.MjModel.from_xml_string(xml)
  try:
    m = mjtpu.put_model(mjm)
  except NotImplementedError as e:
    pytest.skip(f"unsupported fuzz feature: {e}")
  d = mjtpu.make_data(m)
  step = jax.jit(mjtpu.step)
  for _ in range(100):
    d = step(m, d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  assert np.abs(np.asarray(d.qvel)).max() < 100.0
