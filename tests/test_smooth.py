"""Per-stage golden-oracle tests vs MuJoCo C (reference test/smooth_test.py)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu
from tests.conftest import load_mj

MODELS = ["pendulum.xml", "ball_free.xml", "friction_tendon.xml", "cartpole.xml"]


def _setup(name, seed=0):
  mjm = load_mj(name)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.5, 0.5, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.5, 0.5, mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  return mjm, mjd, m, d


@pytest.mark.parametrize("name", MODELS)
def test_smooth_pipeline(name):
  mjm, mjd, m, d = _setup(name)
  d = mjtpu.kinematics(m, d)
  np.testing.assert_allclose(np.asarray(d.xpos), mjd.xpos, atol=1e-12)
  np.testing.assert_allclose(
      np.abs(np.asarray(d.xquat)), np.abs(mjd.xquat), atol=1e-12
  )
  np.testing.assert_allclose(np.asarray(d.xipos), mjd.xipos, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.xanchor), mjd.xanchor, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.xaxis), mjd.xaxis, atol=1e-12)
  np.testing.assert_allclose(
      np.asarray(d.geom_xpos), mjd.geom_xpos, atol=1e-12
  )

  d = mjtpu.com_pos(m, d)
  np.testing.assert_allclose(
      np.asarray(d.subtree_com), mjd.subtree_com, atol=1e-12
  )
  np.testing.assert_allclose(np.asarray(d.cdof), mjd.cdof, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.cinert), mjd.cinert, atol=1e-12)

  d = mjtpu.tendon(m, d)
  np.testing.assert_allclose(np.asarray(d.ten_length), mjd.ten_length, atol=1e-12)
  if mjm.ntendon:
    np.testing.assert_allclose(
        np.asarray(d.ten_J), np.asarray(mjd.ten_J).reshape(mjm.ntendon, mjm.nv),
        atol=1e-12,
    )

  d = mjtpu.crb(m, d)
  qm = np.zeros((mjm.nv, mjm.nv))
  mujoco.mj_fullM(mjm, mjd, qm)
  np.testing.assert_allclose(np.asarray(d.crb), mjd.crb, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.qM), qm, atol=1e-12)

  d = mjtpu.factor_m(m, d)
  x = np.linspace(-1, 1, mjm.nv)
  y = np.asarray(mjtpu.solve_m(m, d, jnp.asarray(x)))
  y_mj = np.zeros((1, mjm.nv))
  mujoco.mj_solveM(mjm, mjd, y_mj, x.reshape(1, -1))
  np.testing.assert_allclose(y, y_mj[0], atol=1e-10)

  d = mjtpu.com_vel(m, d)
  np.testing.assert_allclose(np.asarray(d.cvel), mjd.cvel, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.cdof_dot), mjd.cdof_dot, atol=1e-12)

  d = mjtpu.rne(m, d)
  np.testing.assert_allclose(np.asarray(d.qfrc_bias), mjd.qfrc_bias, atol=1e-11)

  if mjm.ntendon:
    d = d.replace(ten_velocity=d.ten_J @ d.qvel)
  d = mjtpu.passive(m, d)
  np.testing.assert_allclose(
      np.asarray(d.qfrc_passive), mjd.qfrc_passive, atol=1e-11
  )

  d = mjtpu.transmission(m, d)
  np.testing.assert_allclose(
      np.asarray(d.actuator_length), mjd.actuator_length, atol=1e-12
  )
  if mjm.nu:
    moment = np.zeros((mjm.nu, mjm.nv))
    mujoco.mju_sparse2dense(
        moment,
        mjd.actuator_moment,
        mjd.moment_rownnz,
        mjd.moment_rowadr,
        mjd.moment_colind,
    )
    np.testing.assert_allclose(np.asarray(d.actuator_moment), moment, atol=1e-12)


@pytest.mark.parametrize("name", MODELS)
def test_forward(name):
  mjm, mjd, m, d = _setup(name)
  d = mjtpu.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.qacc_smooth), mjd.qacc_smooth, atol=1e-9)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-7)


@pytest.mark.parametrize("name", MODELS)
def test_rne_postconstraint(name):
  mjm, mjd, m, d = _setup(name)
  mujoco.mj_rnePostConstraint(mjm, mjd)
  d = mjtpu.forward(m, d)
  from mjtpu._src import smooth as smooth_mod

  d = smooth_mod.rne_postconstraint(m, d)
  np.testing.assert_allclose(np.asarray(d.cacc), mjd.cacc, atol=1e-7)
  np.testing.assert_allclose(np.asarray(d.cfrc_int), mjd.cfrc_int, atol=1e-6)
  np.testing.assert_allclose(np.asarray(d.cfrc_ext), mjd.cfrc_ext, atol=1e-6)


@pytest.mark.parametrize("name", ["pendulum.xml", "ball_free.xml"])
def test_subtree_vel(name):
  mjm, mjd, m, d = _setup(name)
  mujoco.mj_subtreeVel(mjm, mjd)
  d = mjtpu.kinematics(m, d)
  d = mjtpu.com_pos(m, d)
  d = mjtpu.com_vel(m, d)
  from mjtpu._src import smooth as smooth_mod

  d = smooth_mod.subtree_vel(m, d)
  np.testing.assert_allclose(
      np.asarray(d.subtree_linvel), mjd.subtree_linvel, atol=1e-10
  )
  np.testing.assert_allclose(
      np.asarray(d.subtree_angmom), mjd.subtree_angmom, atol=1e-10
  )
