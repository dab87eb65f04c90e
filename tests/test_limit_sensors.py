"""Joint/tendon limit sensor parity vs MuJoCo C (mjSENS_JOINTLIMIT* /
TENDONLIMIT*) — capability-plus; the reference supports neither.  C
materializes the limit efc row only when dist < margin, so the sensors
read 0 when inactive (oracle-probed)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu

XML = """<mujoco>
<compiler angle="radian"/>
<option timestep="0.002"/>
<worldbody>
  <body pos="0 0 1">
    <joint name="h" type="hinge" axis="0 1 0" range="-0.5 0.5" margin="0.1"
           limited="true" damping="0.1"/>
    <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"/>
  </body>
  <body pos="1 0 1">
    <joint name="b" type="ball" range="0 0.4" margin="0.05" damping="0.05"/>
    <geom type="sphere" size="0.05" pos="0.1 0 0"/>
  </body>
</worldbody>
<tendon><fixed name="t" range="-0.2 0.3" limited="true">
  <joint joint="h" coef="1"/></fixed></tendon>
<sensor>
  <jointlimitpos joint="h"/><jointlimitvel joint="h"/><jointlimitfrc joint="h"/>
  <jointlimitpos joint="b"/><jointlimitvel joint="b"/><jointlimitfrc joint="b"/>
  <tendonlimitpos tendon="t"/><tendonlimitvel tendon="t"/>
  <tendonlimitfrc tendon="t"/>
</sensor>
</mujoco>"""


def _compare(mjm, qpos, qvel):
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = qpos
  mjd.qvel[:] = qvel
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m).replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  d = jax.jit(mjtpu.forward)(m, d)
  np.testing.assert_allclose(
      np.asarray(d.sensordata), mjd.sensordata, atol=1e-9
  )
  return mjd


def test_limit_sensors_inactive():
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = _compare(mjm, mjm.qpos0, np.full(mjm.nv, 0.3))
  assert mjd.nefc == 0 and not mjd.sensordata.any()


def test_limit_sensors_active():
  mjm = mujoco.MjModel.from_xml_string(XML)
  qpos = np.array(mjm.qpos0)
  qpos[0] = 0.45  # hinge near limit (within margin), tendon violated
  a = 0.3  # ball rotation angle 0.6 > 0.4 limit
  qpos[1:5] = [np.cos(a), 0.0, 0.0, np.sin(a)]
  mjd = _compare(mjm, qpos, np.full(mjm.nv, 0.2))
  assert mjd.nefc >= 3 and np.abs(mjd.sensordata).sum() > 0.1


def test_limit_sensors_trajectory():
  """Sensors track C through 100 steps of limit bouncing."""
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  mjd.qvel[0] = 3.0
  mjd.qvel[1] = 2.0
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m).replace(qvel=jnp.asarray(np.array(mjd.qvel)))
  step = jax.jit(mjtpu.step)
  hits = 0
  for i in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    np.testing.assert_allclose(
        np.asarray(d.sensordata), mjd.sensordata, atol=1e-7,
        err_msg=f"step {i}",
    )
    hits += mjd.nefc > 0
  assert hits > 10  # the limits actually engaged
