"""CONTACT sensor parity vs MuJoCo C (mjSENS_CONTACT, MuJoCo 3.3+) —
capability-plus; the reference has no contact query sensor.

Oracle-probed semantics: match criteria (geom/body/subtree sided, site
volumetric), object-1 flipping (normal/tangent negate, force/torque t2
component negates), found = total matches written to filled slots only,
reduce none/mindist/maxforce/netforce (world-frame sums about the
force-magnitude-weighted centroid), and no cutoff clamp.

NOTE on ordering: with reduce="none" and several matches, C fills slots in
d->contact order, which mjtpu reproduces only within a single collider
group — multi-slot comparisons below sort slots to stay order-insensitive.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu

pytestmark = pytest.mark.skipif(
    not hasattr(mujoco.mjtSensor, "mjSENS_CONTACT"),
    reason="host mujoco predates the CONTACT sensor",
)

XML = """<mujoco>
<worldbody>
  <geom name="floor" type="plane" size="3 3 .1" condim="6" friction="1 0.1 0.1"/>
  <body name="b1" pos="0 0 0.045"><freejoint/>
    <geom name="g1" type="box" size="0.05 0.05 0.05" condim="6" friction="1 0.1 0.1"/>
    <body name="b1c" pos="0 0 0.1">
      <joint type="hinge" axis="0 1 0"/>
      <geom name="g1c" type="sphere" size="0.04"/>
    </body>
  </body>
  <body name="b2" pos="0.06 0 0.13"><freejoint/>
    <geom name="g2" type="sphere" size="0.05"/>
  </body>
  <site name="zone" type="sphere" pos="0.05 0.05 0" size="0.08"/>
</worldbody>
<sensor>
  <contact name="c_all" num="8"/>
  <contact name="c_geom2side" geom1="g2" geom2="g1" num="1"
           data="found force torque dist pos normal tangent"/>
  <contact name="c_geom2rev" geom1="g1" geom2="g2" num="1"
           data="found force torque dist pos normal tangent"/>
  <contact name="c_body" body1="b1" num="8" data="found dist"/>
  <contact name="c_subtree" subtree1="b1" num="8" data="found dist"/>
  <contact name="c_site" site="zone" num="4" data="found dist pos"/>
  <contact name="c_mindist" body1="b1" num="1" reduce="mindist"
           data="found force dist pos normal"/>
  <contact name="c_maxforce" geom1="floor" num="1" reduce="maxforce"
           data="found force dist"/>
  <contact name="c_net" body1="b1" num="1" reduce="netforce"
           data="force torque pos"/>
</sensor>
</mujoco>"""


def _pair(qvel=None):
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  if qvel is not None:
    mjd.qvel[:] = qvel
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m).replace(
      qpos=jnp.asarray(np.array(mjd.qpos)),
      qvel=jnp.asarray(np.array(mjd.qvel)),
  )
  d = jax.jit(mjtpu.forward)(m, d)
  return mjm, mjd, m, d


def _slots(mjm, sensordata, name, slotdim):
  sid = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_SENSOR, name)
  a, dim = mjm.sensor_adr[sid], mjm.sensor_dim[sid]
  return np.asarray(sensordata[a : a + dim]).reshape(-1, slotdim)


def _sorted(rows):
  return rows[np.lexsort(rows.T[::-1])]


def test_contact_sensor_static():
  """All criteria and reductions vs C at a static pose (order-insensitive
  where several slots fill)."""
  mjm, mjd, m, d = _pair()
  js = np.asarray(d.sensordata)
  cs = mjd.sensordata
  # single-slot sensors are directly comparable
  for name, slotdim in (
      ("c_geom2side", 17), ("c_geom2rev", 17), ("c_mindist", 11),
      ("c_maxforce", 5), ("c_net", 9),
  ):
    np.testing.assert_allclose(
        _slots(mjm, js, name, slotdim), _slots(mjm, cs, name, slotdim),
        atol=1e-9, err_msg=name,
    )
  # multi-slot: compare as sorted row sets
  for name, slotdim in (
      ("c_all", 1), ("c_body", 2), ("c_subtree", 2), ("c_site", 5),
  ):
    np.testing.assert_allclose(
        _sorted(_slots(mjm, js, name, slotdim)),
        _sorted(_slots(mjm, cs, name, slotdim)),
        atol=1e-9, err_msg=name,
    )


def test_contact_sensor_sliding():
  """Friction/torque fields under sliding + spinning (condim 6)."""
  mjm, mjd, m, d = _pair(qvel=[0.5, 0, 0, 1, 0, 4, 0, 0, 0, 0, 0, 0, 0])
  js, cs = np.asarray(d.sensordata), mjd.sensordata
  for name, slotdim in (
      ("c_geom2side", 17), ("c_geom2rev", 17), ("c_mindist", 11),
      ("c_maxforce", 5), ("c_net", 9),
  ):
    np.testing.assert_allclose(
        _slots(mjm, js, name, slotdim), _slots(mjm, cs, name, slotdim),
        atol=1e-8, err_msg=name,
    )


def test_contact_sensor_no_match():
  """Sensors read 0 when nothing matches (bodies separated)."""
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[2] = 1.0   # lift b1
  mjd.qpos[9] = 2.0   # lift b2
  mujoco.mj_forward(mjm, mjd)
  assert mjd.ncon == 0
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m).replace(qpos=jnp.asarray(np.array(mjd.qpos)))
  d = jax.jit(mjtpu.forward)(m, d)
  np.testing.assert_allclose(np.asarray(d.sensordata), 0.0, atol=0)
  np.testing.assert_allclose(mjd.sensordata, 0.0, atol=0)


def test_contact_sensor_trajectory():
  """Single-pair model: every field tracks C through 100 steps of a ball
  falling, bouncing and rolling on the floor."""
  xml = """<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 .1" condim="6" friction="1 0.1 0.1"/>
    <body name="ball" pos="0 0 0.1"><freejoint/>
      <geom name="g" type="sphere" size="0.05" condim="6" friction="1 0.1 0.1"/>
    </body>
  </worldbody>
  <sensor>
    <contact name="c" geom1="g" num="1"
             data="found force torque dist pos normal tangent"/>
    <contact name="n" body1="ball" num="1" reduce="netforce"
             data="force torque pos"/>
  </sensor>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.qvel[0] = 1.0
  mjd.qvel[4] = 8.0
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
    hits += mjd.ncon > 0
  assert hits > 20
