"""Slider-crank transmission parity vs MuJoCo C (mj_transmission,
mjTRN_SLIDERCRANK) — capability-plus: the reference supports only
joint/jointinparent/site/tendon transmissions."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu

XML = """<mujoco>
<option timestep="0.002"/>
<worldbody>
  <body pos="0 0 1">
    <joint name="h1" type="hinge" axis="0 1 0" damping="0.2"/>
    <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"/>
    <site name="crank" pos="0.3 0 0"/>
    <body pos="0.3 0 0">
      <joint name="h2" type="hinge" axis="0 0 1" damping="0.1"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.15 0.1 0"/>
    </body>
  </body>
  <body pos="0.1 0.2 0.8">
    <joint name="s1" type="slide" axis="1 0 0.3" damping="0.3"/>
    <geom type="box" size=".04 .04 .04"/>
    <site name="slider" pos="0 0 0.05" euler="20 30 0"/>
  </body>
</worldbody>
<actuator>
  <general name="sc" cranksite="crank" slidersite="slider"
           cranklength="0.9" gear="1.7" gainprm="5"/>
</actuator>
</mujoco>"""


def _dense_moment(mjm, mjd):
  mom = np.zeros((mjm.nu, mjm.nv))
  mujoco.mju_sparse2dense(
      mom, mjd.actuator_moment, mjd.moment_rownnz, mjd.moment_rowadr,
      mjd.moment_colind,
  )
  return mom


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_slidercrank_length_moment(seed):
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qpos[:] = rng.uniform(-0.7, 0.7, mjm.nq)
  mujoco.mj_forward(mjm, mjd)

  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m).replace(qpos=jnp.asarray(np.array(mjd.qpos)))
  d = jax.jit(mjtpu.fwd_position)(m, d)

  np.testing.assert_allclose(
      np.asarray(d.actuator_length), mjd.actuator_length, atol=1e-10
  )
  np.testing.assert_allclose(
      np.asarray(d.actuator_moment), _dense_moment(mjm, mjd), atol=1e-10
  )


def test_slidercrank_trajectory():
  """100 actuated steps track C through the full dynamics."""
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  step = jax.jit(mjtpu.step)
  rng = np.random.default_rng(7)
  for i in range(100):
    ctrl = rng.uniform(-1, 1, mjm.nu)
    mjd.ctrl[:] = ctrl
    d = d.replace(ctrl=jnp.asarray(ctrl))
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    np.testing.assert_allclose(
        np.asarray(d.qpos), mjd.qpos, atol=1e-9, err_msg=f"step {i}"
    )
    np.testing.assert_allclose(
        np.asarray(d.qvel), mjd.qvel, atol=1e-8, err_msg=f"step {i}"
    )


ADHESION_XML = """<mujoco>
<option timestep="0.002"/>
<worldbody>
  <geom type="plane" size="3 3 .1"/>
  <body name="box" pos="0 0 0.049"><freejoint/>
    <geom type="box" size="0.05 0.05 0.05" margin="0.02" gap="0.02"/>
  </body>
</worldbody>
<actuator><adhesion body="box" gain="30" ctrlrange="0 1"/></actuator>
</mujoco>"""


@pytest.mark.parametrize("lift", [0.049, 0.058, 0.075, 0.095])
def test_adhesion_moment(lift):
  """TRN_BODY moment parity: penetrating, margin-zone AND gap-band
  (C exclude==1, no efc rows) contacts all count — the
  adhesion-at-a-distance case.  0.095 is past margin+gap: moment 0."""
  mjm = mujoco.MjModel.from_xml_string(ADHESION_XML)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[2] = lift
  mujoco.mj_forward(mjm, mjd)
  assert (mjd.ncon > 0) == (lift < 0.09)

  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m).replace(qpos=jnp.asarray(np.array(mjd.qpos)))
  d = jax.jit(mjtpu.fwd_position)(m, d)
  np.testing.assert_allclose(
      np.asarray(d.actuator_moment), _dense_moment(mjm, mjd), atol=1e-9
  )
  np.testing.assert_allclose(
      np.asarray(d.actuator_length), mjd.actuator_length, atol=1e-12
  )


def test_adhesion_trajectory():
  """Adhesion holds the box against gravity; trajectory tracks C."""
  mjm = mujoco.MjModel.from_xml_string(ADHESION_XML)
  mjd = mujoco.MjData(mjm)
  mjd.ctrl[0] = 1.0
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m).replace(ctrl=jnp.asarray(np.array(mjd.ctrl)))
  step = jax.jit(mjtpu.step)
  for i in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    np.testing.assert_allclose(
        np.asarray(d.qpos), mjd.qpos, atol=1e-8, err_msg=f"step {i}"
    )
  # adhesion force must be pulling down (sticking), not pushing
  assert mjd.qfrc_actuator[2] < -1.0
  np.testing.assert_allclose(
      np.asarray(d.qfrc_actuator), mjd.qfrc_actuator, atol=1e-8
  )
