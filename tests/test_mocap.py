"""Mocap-body parity vs MuJoCo C (mj_kinematics overrides xpos/xquat for
body_mocapid >= 0; reference mujoco_torch/_src/smooth.py:105-111 and Data
fields types.py:1091+)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mjtpu
from tests.conftest import load_mj


def _put(mjm, mjd):
  m = mjtpu.put_model(mjm)
  return m, mjtpu.put_data(m, mjd)


def test_kinematics_parity(rng):
  """Random mocap poses land exactly in xpos/xquat (and children frames)."""
  mjm = load_mj("mocap.xml")
  mjd = mujoco.MjData(mjm)
  for _ in range(5):
    mjd.mocap_pos[:] = rng.uniform(-1, 1, (mjm.nmocap, 3))
    q = rng.uniform(-1, 1, (mjm.nmocap, 4))
    mjd.mocap_quat[:] = q
    mujoco.mj_kinematics(mjm, mjd)
    m, d = _put(mjm, mjd)
    d = jax.jit(mjtpu.kinematics)(m, d)
    np.testing.assert_allclose(np.asarray(d.xpos), mjd.xpos, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.xquat), mjd.xquat, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.geom_xpos), mjd.geom_xpos,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.site_xpos), mjd.site_xpos,
                               atol=1e-12)


def test_make_data_defaults():
  """make_data seeds mocap pose from body_pos/body_quat (mj_makeData)."""
  mjm = load_mj("mocap.xml")
  mjd = mujoco.MjData(mjm)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  np.testing.assert_allclose(np.asarray(d.mocap_pos), mjd.mocap_pos,
                             atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.mocap_quat), mjd.mocap_quat,
                             atol=1e-12)


def test_trajectory_moving_target(rng):
  """100-step parity with a mocap target moving every step: drives the
  welded payload and collides with the falling ball."""
  mjm = load_mj("mocap.xml")
  mjd = mujoco.MjData(mjm)
  m = mjtpu.put_model(mjm)
  d = mjtpu.put_data(m, mjd)
  step = jax.jit(mjtpu.step)
  base_pos = np.array(mjd.mocap_pos)
  for i in range(100):
    t = i * float(mjm.opt.timestep)
    pos = base_pos + np.array([0.2 * np.sin(3 * t), 0.0, 0.1 * t])[None]
    ang = 0.8 * t
    quat = np.array([[np.cos(ang / 2), 0.0, 0.0, np.sin(ang / 2)],
                     [1.0, 0.0, 0.0, 0.0]])
    mjd.mocap_pos[:] = pos
    mjd.mocap_quat[:] = quat
    d = d.replace(mocap_pos=jnp.asarray(pos), mocap_quat=jnp.asarray(quat))
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    err = max(
        np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
        np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
    )
    assert err < 1e-6, f"diverged at step {i}: {err:.3e}"
  # the welded payload actually tracked the target (moved > 5 cm)
  payload_q = np.asarray(d.qpos)[:3]
  assert np.linalg.norm(payload_q - np.array([0.3, 0.1, 0.9])) > 0.05


def test_vmap_batched_mocap(rng):
  """Per-env mocap poses batch through vmap (each env tracks its own)."""
  mjm = load_mj("mocap.xml")
  m = mjtpu.put_model(mjm)
  d0 = mjtpu.make_data(m)
  B = 4
  pos = jnp.asarray(rng.uniform(-0.5, 0.5, (B, mjm.nmocap, 3)))
  bd = jax.vmap(lambda p: d0.replace(mocap_pos=p))(pos)
  out = jax.jit(jax.vmap(mjtpu.kinematics, in_axes=(None, 0)))(m, bd)
  mocap_bodies = np.nonzero(mjm.body_mocapid >= 0)[0]
  ids = mjm.body_mocapid[mocap_bodies]
  np.testing.assert_allclose(
      np.asarray(out.xpos)[:, mocap_bodies], np.asarray(pos)[:, ids],
      atol=1e-12)
