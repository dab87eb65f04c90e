"""Inverse dynamics parity vs mj_inverse (reference test/inverse_test.py)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu
from tests.conftest import load_mj


@pytest.mark.parametrize("name", ["pendulum.xml", "ball_free.xml", "spheres.xml"])
def test_inverse(name):
  mjm = load_mj(name)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(0)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.2, 0.2, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.5, 0.5, mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  mujoco.mj_inverse(mjm, mjd)

  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)),
      qvel=jnp.asarray(np.array(mjd.qvel)),
      qacc=jnp.asarray(np.array(mjd.qacc)),
  )
  d = jax.jit(mjtpu.inverse)(m, d)
  np.testing.assert_allclose(
      np.asarray(d.qfrc_inverse), mjd.qfrc_inverse, atol=5e-6
  )


@pytest.mark.parametrize("integ", ["Euler", "implicitfast", "implicit"])
def test_inverse_discrete(integ):
  """mjENBL_INVDISCRETE: qacc is converted discrete->continuous before the
  force reconstruction and restored afterwards (reference
  test/inverse_test.py:90-173; `implicit` is capability-plus — C applies
  the same ImplicitFast-level conversion, oracle-probed)."""
  xml = f"""
  <mujoco>
    <option integrator="{integ}" viscosity="0.1" density="5"/>
    <worldbody>
      <body pos="0.15 0 0">
        <joint type="hinge" axis="0 1 0" damping="5"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 .1 0 0"/>
        <body pos="0.1 0 0">
          <joint type="hinge" axis="0 1 0" damping="3"/>
          <geom type="capsule" size="0.015" fromto="-.1 0 0 .1 0 0"/>
        </body>
      </body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjm.opt.enableflags |= mujoco.mjtEnableBit.mjENBL_INVDISCRETE
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(0)
  mjd.qvel[:] = rng.uniform(-0.5, 0.5, mjm.nv)
  for _ in range(10):
    mujoco.mj_step(mjm, mjd)
  qacc_before = mjd.qacc.copy()
  mujoco.mj_inverse(mjm, mjd)

  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)),
      qvel=jnp.asarray(np.array(mjd.qvel)),
      qacc=jnp.asarray(qacc_before),
  )
  d = jax.jit(mjtpu.inverse)(m, d)
  np.testing.assert_allclose(
      np.asarray(d.qfrc_inverse), mjd.qfrc_inverse, atol=1e-8, rtol=1e-8
  )
  # qacc restored, like C
  np.testing.assert_allclose(np.asarray(d.qacc), qacc_before, atol=1e-14)


def test_fwd_inv_consistency():
  """forward then inverse recovers the applied force (mjENBL_FWDINV check)."""
  mjm = load_mj("capsules.xml")
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  rng = np.random.default_rng(1)
  qfrc = jnp.asarray(rng.uniform(-1, 1, mjm.nv))
  d = d.replace(qvel=jnp.asarray(rng.uniform(-0.2, 0.2, mjm.nv)), qfrc_applied=qfrc)
  d = jax.jit(mjtpu.forward)(m, d)
  d_inv = jax.jit(mjtpu.inverse)(m, d)
  # qfrc_inverse = net applied generalized force = qfrc_applied (nu = 0)
  np.testing.assert_allclose(
      np.asarray(d_inv.qfrc_inverse), np.asarray(qfrc), atol=1e-6
  )
