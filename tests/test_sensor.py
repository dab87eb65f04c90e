"""Sensor parity vs MuJoCo C — all three stages, including the acc-stage
body/subtree sensors the reference zeroes (reference test/sensor_test.py +
SURVEY.md §2.4 gap-fix)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mjtpu
from tests.conftest import load_mj


def test_all_sensors_vs_c():
  mjm = load_mj("sensors.xml")
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(0)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.2, 0.2, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.5, 0.5, mjm.nv)
  mjd.ctrl[:] = rng.uniform(-1, 1, mjm.nu)
  mujoco.mj_step(mjm, mjd)
  mujoco.mj_forward(mjm, mjd)

  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      time=jnp.asarray(float(mjd.time)),
      qpos=jnp.asarray(np.array(mjd.qpos)),
      qvel=jnp.asarray(np.array(mjd.qvel)),
      ctrl=jnp.asarray(np.array(mjd.ctrl)),
      qacc_warmstart=jnp.asarray(np.array(mjd.qacc_warmstart)),
  )
  d = jax.jit(mjtpu.forward)(m, d)
  sd_my = np.asarray(d.sensordata)
  for i in range(mjm.nsensor):
    adr, dim = mjm.sensor_adr[i], mjm.sensor_dim[i]
    name = mujoco.mjtSensor(mjm.sensor_type[i]).name
    np.testing.assert_allclose(
        sd_my[adr : adr + dim],
        mjd.sensordata[adr : adr + dim],
        atol=1e-9,
        err_msg=f"sensor {name}",
    )


def test_hfield_trajectory():
  """Sphere on bumpy terrain tracks MuJoCo C (jitted hfield path —
  the reference left hfield uncompiled, collision_driver.py:332)."""
  mjm = load_mj("hfield.xml")
  hdata = 0.5 + 0.4 * np.sin(np.linspace(0, 3, 20))[:, None] * np.cos(
      np.linspace(0, 4, 20)
  )[None, :]
  mjm.hfield_data[:] = hdata.reshape(-1)
  mjd = mujoco.MjData(mjm)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  step = jax.jit(mjtpu.step)
  for i in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    err = max(
        np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
        np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
    )
    assert err < 1e-6, f"hfield diverged at {i}: {err:.3e}"
