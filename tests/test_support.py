"""Support-function parity vs MuJoCo C (reference test/support_test.py):
jac, apply_ft, xfrc_accumulate, full_m/mul_m, contact force decoding,
muscle curves (mju_muscle*)."""

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu
from mjtpu._src import support
from tests.conftest import load_mj

MODELS = ["pendulum.xml", "ball_free.xml", "cartpole.xml", "friction_tendon.xml"]


def _setup(name, seed=0):
  mjm = load_mj(name)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.3, 0.3, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.3, 0.3, mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  d = mjtpu.com_pos(m, mjtpu.kinematics(m, d))
  return mjm, mjd, m, d


@pytest.mark.parametrize("name", MODELS)
def test_jac(name):
  """jac(point, body) matches mj_jac for every body at a random point."""
  mjm, mjd, m, d = _setup(name)
  rng = np.random.default_rng(1)
  for body in range(1, mjm.nbody):
    point = rng.uniform(-1, 1, 3)
    jacp = np.zeros((3, mjm.nv))
    jacr = np.zeros((3, mjm.nv))
    mujoco.mj_jac(mjm, mjd, jacp, jacr, point, body)
    ours_p, ours_r = support.jac(m, d, jnp.asarray(point), body)
    np.testing.assert_allclose(np.asarray(ours_p), jacp.T, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ours_r), jacr.T, atol=1e-12)


@pytest.mark.parametrize("name", MODELS)
def test_apply_ft(name):
  """apply_ft matches mj_applyFT's qfrc_target contribution."""
  mjm, mjd, m, d = _setup(name)
  rng = np.random.default_rng(2)
  body = mjm.nbody - 1
  force = rng.uniform(-1, 1, 3)
  torque = rng.uniform(-1, 1, 3)
  point = rng.uniform(-1, 1, 3)
  qfrc = np.zeros(mjm.nv)
  mujoco.mj_applyFT(mjm, mjd, force, torque, point, body, qfrc)
  ours = support.apply_ft(
      m, d, jnp.asarray(force), jnp.asarray(torque), jnp.asarray(point), body
  )
  np.testing.assert_allclose(np.asarray(ours), qfrc, atol=1e-12)


@pytest.mark.parametrize("name", MODELS)
def test_xfrc_accumulate(name):
  """xfrc_accumulate == sum of mj_applyFT at xipos over all bodies."""
  mjm, mjd, m, d = _setup(name)
  rng = np.random.default_rng(3)
  xfrc = rng.uniform(-1, 1, (mjm.nbody, 6))
  xfrc[0] = 0.0
  qfrc = np.zeros(mjm.nv)
  for b in range(1, mjm.nbody):
    mujoco.mj_applyFT(
        mjm, mjd, xfrc[b, :3], xfrc[b, 3:], mjd.xipos[b], b, qfrc
    )
  d = d.replace(xfrc_applied=jnp.asarray(xfrc))
  ours = support.xfrc_accumulate(m, d)
  np.testing.assert_allclose(np.asarray(ours), qfrc, atol=1e-12)


@pytest.mark.parametrize("name", MODELS)
def test_full_m_mul_m(name):
  mjm, mjd, m, d = _setup(name)
  d = mjtpu.crb(m, d)
  if mjm.ntendon:
    d = mjtpu.tendon(m, mjtpu.com_pos(m, mjtpu.kinematics(m, d)))
    d = mjtpu.crb(m, d)
    d = mjtpu.tendon_armature(m, d)
  qm = np.zeros((mjm.nv, mjm.nv))
  mujoco.mj_fullM(mjm, mjd, qm)
  np.testing.assert_allclose(np.asarray(support.full_m(m, d)), qm, atol=1e-12)
  vec = np.linspace(-1, 1, mjm.nv)
  res = np.zeros(mjm.nv)
  mujoco.mj_mulM(mjm, mjd, res, vec)
  np.testing.assert_allclose(
      np.asarray(support.mul_m(m, d, jnp.asarray(vec))), res, atol=1e-11
  )


@pytest.mark.parametrize(
    "name", ["spheres.xml", "condim4_pyramidal.xml", "condim6_elliptic.xml"]
)
def test_contact_forces(name):
  """contact_forces matches mj_contactForce row-by-row (contacts matched by
  position since ordering differs)."""
  mjm = load_mj(name)
  mjd = mujoco.MjData(mjm)
  # drop each free body so its (sphere) geom penetrates the floor slightly,
  # with a tangential velocity to activate the friction rows
  mjd.qpos[:] = mjm.qpos0
  for j in range(mjm.njnt):
    if mjm.jnt_type[j] != mujoco.mjtJoint.mjJNT_FREE:
      continue
    b = mjm.jnt_bodyid[j]
    g = mjm.body_geomadr[b]
    mjd.qpos[mjm.jnt_qposadr[j] + 2] = mjm.geom_size[g, 0] - 0.002
    mjd.qvel[mjm.jnt_dofadr[j]] = 0.3
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  d = mjtpu.forward(m, d)
  ours = np.asarray(support.contact_forces(m, d))
  dist = np.asarray(d.contact.dist)
  pos = np.asarray(d.contact.pos)
  active = dist < 0
  assert active.any() and mjd.ncon > 0, "setup must produce active contacts"
  matched = 0
  for c in np.flatnonzero(active):
    theirs = int(np.argmin(np.linalg.norm(mjd.contact.pos - pos[c], axis=1)))
    if np.linalg.norm(mjd.contact.pos[theirs] - pos[c]) > 1e-6:
      continue
    f_mj = np.zeros(6)
    mujoco.mj_contactForce(mjm, mjd, theirs, f_mj)
    np.testing.assert_allclose(
        ours[c], f_mj, atol=1e-6, err_msg=f"{name}: contact {c}"
    )
    matched += 1
  assert matched > 0, "no contacts matched between engines"


def test_muscle_curves():
  """muscle gain/bias/dynamics vs mju_muscle* over a grid."""
  prm = np.array([0.75, 1.05, -1.0, 200.0, 0.5, 1.6, 1.5, 1.3, 1.2])
  lengthrange = np.array([0.2, 0.6])
  acc0 = 20.0
  for length in np.linspace(0.15, 0.7, 12):
    for vel in np.linspace(-1.0, 1.0, 7):
      g_mj = mujoco.mju_muscleGain(length, vel, lengthrange, acc0, prm)
      b_mj = mujoco.mju_muscleBias(length, lengthrange, acc0, prm)
      g = float(support.muscle_gain(length, vel, jnp.asarray(lengthrange), acc0, jnp.asarray(prm)))
      b = float(support.muscle_bias(length, jnp.asarray(lengthrange), acc0, jnp.asarray(prm)))
      np.testing.assert_allclose(g, g_mj, atol=1e-9, err_msg=f"gain l={length} v={vel}")
      np.testing.assert_allclose(b, b_mj, atol=1e-9, err_msg=f"bias l={length}")
  dyn_prm = np.array([0.01, 0.04, 0.0])
  dyn_prm_smooth = np.array([0.01, 0.04, 0.2])
  for ctrl in np.linspace(-0.2, 1.2, 8):
    for act in np.linspace(0.0, 1.0, 5):
      for p in (dyn_prm, dyn_prm_smooth):
        ours = float(support.muscle_dynamics(ctrl, act, jnp.asarray(p)))
        theirs = mujoco.mju_muscleDynamics(ctrl, act, p)
        np.testing.assert_allclose(
            ours, theirs, atol=1e-9, err_msg=f"dyn ctrl={ctrl} act={act} w={p[2]}"
        )
