"""Sensor parity vs MuJoCo C — all three stages, including the acc-stage
body/subtree sensors the reference zeroes (reference test/sensor_test.py +
SURVEY.md §2.4 gap-fix).  Per-type sweep mirrors reference
test/sensor_test.py (472 LoC): frame-sensor objtype×reftype matrix, cutoff
datatypes, empty model, and a graph-flatness guard for the trace-time
sensor grouping (reference device.py:381-585 analog)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu
from tests.conftest import load_mj


def _forward_pair(mjm, seed=0, kick=0.2):
  """Randomized state, C forward + mjtpu forward, returns (mjd, d)."""
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-kick, kick, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.5, 0.5, mjm.nv)
  if mjm.nu:
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
  return mjd, jax.jit(mjtpu.forward)(m, d)


def _assert_sensordata(mjm, mjd, d, atol=1e-9):
  sd = np.asarray(d.sensordata)
  for i in range(mjm.nsensor):
    adr, dim = mjm.sensor_adr[i], mjm.sensor_dim[i]
    name = mujoco.mjtSensor(mjm.sensor_type[i]).name
    np.testing.assert_allclose(
        sd[adr : adr + dim],
        mjd.sensordata[adr : adr + dim],
        atol=atol,
        err_msg=f"sensor {i} ({name})",
    )


def test_all_sensors_vs_c():
  mjm = load_mj("sensors.xml")
  mjd, d = _forward_pair(mjm)
  _assert_sensordata(mjm, mjd, d)


# frame-sensor matrix: every (kind × objtype × reftype) combination the XML
# schema admits, in one model (reference sensor_test.py framepos/framevel
# cases, widened to the full matrix)
_FRAME_OBJS = [
    ("body", "b2"),
    ("xbody", "b2"),
    ("geom", "g2"),
    ("site", "s2"),
    ("camera", "cam1"),
]
_FRAME_REFS = [
    None,
    ("site", "s_ref"),
    ("body", "b1"),
    ("xbody", "b1"),
    ("geom", "g1"),
    ("camera", "cam_ref"),
]
_FRAME_KINDS_POSVEL = [
    "framepos", "framequat", "framexaxis", "frameyaxis", "framezaxis",
    "framelinvel", "frameangvel",
]
_FRAME_KINDS_ACC = ["framelinacc", "frameangacc"]


def _frame_matrix_xml():
  rows = []
  for kind in _FRAME_KINDS_POSVEL:
    for objtype, objname in _FRAME_OBJS:
      for ref in _FRAME_REFS:
        r = f'reftype="{ref[0]}" refname="{ref[1]}"' if ref else ""
        rows.append(f'<{kind} objtype="{objtype}" objname="{objname}" {r}/>')
  for kind in _FRAME_KINDS_ACC:  # schema: no reference frame on acc sensors
    for objtype, objname in _FRAME_OBJS:
      rows.append(f'<{kind} objtype="{objtype}" objname="{objname}"/>')
  return f"""
  <mujoco>
    <option timestep="0.004"/>
    <worldbody>
      <body name="b1" pos="0 0 1">
        <joint name="j1" type="ball"/>
        <geom name="g1" type="sphere" size="0.1" mass="1"/>
        <site name="s_ref" pos="0 0.1 0" euler="0.3 0 0.5"/>
        <camera name="cam_ref" pos="0.2 0 0.1"/>
        <body name="b2" pos="0.4 0 0">
          <joint name="j2" type="hinge" axis="0 1 0"/>
          <geom name="g2" type="capsule" fromto="0 0 0 0.2 0 0" size="0.04"
                mass="0.5"/>
          <site name="s2" pos="0.2 0 0" euler="0 0.4 0"/>
          <camera name="cam1" pos="0 0 0.2" euler="0.2 0.1 0"/>
        </body>
      </body>
    </worldbody>
    <sensor>
      {chr(10).join(rows)}
    </sensor>
  </mujoco>
  """


def test_frame_sensor_matrix_vs_c():
  """All 5 objtypes × 6 reftypes × 7 pos/vel kinds + 2 acc kinds (224
  sensors) bit-match MuJoCo C."""
  mjm = mujoco.MjModel.from_xml_string(_frame_matrix_xml())
  mjd, d = _forward_pair(mjm, kick=0.4)
  _assert_sensordata(mjm, mjd, d)


def test_cutoff_datatypes_vs_c():
  """Cutoff clamps REAL sensors to ±cutoff and POSITIVE sensors to
  [0, cutoff]; cutoff=0 means no clamp."""
  xml = """
  <mujoco>
    <worldbody>
      <geom type="plane" size="3 3 0.1"/>
      <body pos="0 0 0.08">
        <freejoint/>
        <geom type="sphere" size="0.1" mass="1"/>
        <!-- site sphere encloses the whole geom so C's zone test and
             mjtpu's body-membership TOUCH approximation agree -->
        <site name="s" type="sphere" size="0.25" zaxis="0 0 -1"/>
      </body>
      <body pos="2 0 1">
        <joint name="h" type="hinge" axis="0 1 0"/>
        <geom type="sphere" size="0.1" mass="1"/>
      </body>
    </worldbody>
    <sensor>
      <jointpos joint="h" cutoff="0.05"/>
      <jointpos joint="h"/>
      <rangefinder site="s" cutoff="0.001"/>
      <rangefinder site="s"/>
      <touch site="s" cutoff="1e-4"/>
      <touch site="s"/>
    </sensor>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[mjm.jnt_qposadr[1]] = 0.3  # hinge past the 0.05 cutoff
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(qpos=jnp.asarray(np.array(mjd.qpos)))
  d = jax.jit(mjtpu.forward)(m, d)
  # every clamp must actually engage: clamped != unclamped partner
  sd = np.asarray(d.sensordata)
  assert abs(sd[0]) <= 0.05 + 1e-12 and abs(sd[1]) > 0.05
  assert sd[2] <= 0.001 + 1e-12 and sd[3] > 0.001
  assert sd[4] <= 1e-4 + 1e-12 and sd[5] > 1e-4
  _assert_sensordata(mjm, mjd, d)


def test_empty_sensor_model():
  """nsensor == 0: forward runs, sensordata stays shape-(0,)."""
  xml = """
  <mujoco><worldbody><body pos="0 0 1"><joint type="hinge"/>
  <geom type="sphere" size="0.1" mass="1"/></body></worldbody></mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  d = jax.jit(mjtpu.forward)(m, mjtpu.make_data(m))
  assert d.sensordata.shape == (0,)


def _nsensor_model(n: int) -> mujoco.MjModel:
  sensors = []
  for _ in range(n):
    sensors.append('<jointpos joint="h"/>')
    sensors.append('<framepos objtype="site" objname="s"/>')
    sensors.append('<gyro site="s"/>')
  xml = f"""
  <mujoco>
    <worldbody>
      <body pos="0 0 1">
        <joint name="h" type="hinge" axis="0 1 0"/>
        <geom type="sphere" size="0.1" mass="1"/>
        <site name="s" pos="0.1 0 0"/>
      </body>
    </worldbody>
    <sensor>{''.join(sensors)}</sensor>
  </mujoco>
  """
  return mujoco.MjModel.from_xml_string(xml)


def test_sensor_graph_flat_in_nsensor():
  """Trace-time grouping keeps the sensor graph O(ngroups), not O(nsensor):
  67× more sensors may not even double the jaxpr equation count (the
  reference precomputes groups for the same reason, device.py:381-585)."""
  from mjtpu._src import sensor as sensor_mod

  def eqns(n):
    m = mjtpu.put_model(_nsensor_model(n))
    d = mjtpu.make_data(m)
    jaxpr = jax.make_jaxpr(
        lambda dd: sensor_mod.sensor_pos(m, dd).sensordata
    )(d)
    return len(jaxpr.eqns)

  small, large = eqns(3), eqns(200)
  assert large <= 2 * small, (small, large)


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


def test_camprojection():
  """CAMPROJECTION parity: fovy and intrinsic (sensorsize/focal) cameras.
  Oracle-probed: C ignores the principal point."""
  xml = """<mujoco>
  <worldbody>
    <body pos="0 0 1">
      <joint type="hinge" axis="0 1 0"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"/>
      <site name="tip" pos="0.3 0 0.1"/>
    </body>
    <camera name="fovycam" pos="1 -1.5 1.2" xyaxes="1 0.5 0 0 0.3 1"
            resolution="640 480" fovy="50"/>
    <camera name="intrcam" pos="-0.5 -1.5 1.0" xyaxes="1 0 0 0 0.3 1"
            resolution="320 240" sensorsize="0.036 0.024"
            focal="0.05 0.05" principal="0.001 -0.002"/>
  </worldbody>
  <sensor>
    <camprojection site="tip" camera="fovycam"/>
    <camprojection site="tip" camera="intrcam"/>
  </sensor>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[0] = 0.3
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m).replace(qpos=jnp.asarray(np.array(mjd.qpos)))
  d = jax.jit(mjtpu.forward)(m, d)
  np.testing.assert_allclose(
      np.asarray(d.sensordata), mjd.sensordata, atol=1e-6
  )


def test_insidesite():
  """INSIDESITE parity across all site volume types (pos stage)."""
  xml = """<mujoco>
  <worldbody>
    <site name="z1" type="box" pos="0 0 1" size="0.2 0.3 0.4" euler="10 20 0"/>
    <site name="z2" type="cylinder" pos="1 0 1" size="0.2 0.3 0" euler="0 30 0"/>
    <site name="z3" type="ellipsoid" pos="2 0 1" size="0.2 0.3 0.4"/>
    <site name="z4" type="capsule" pos="3 0 1" size="0.2 0.3 0"/>
    <site name="z5" type="sphere" pos="4 0 1" size="0.25"/>
    <body pos="0 0 1.2"><freejoint/><geom type="sphere" size="0.05"/>
      <site name="pt"/></body>
  </worldbody>
  <sensor>
    <insidesite site="z1" objtype="site" objname="pt"/>
    <insidesite site="z2" objtype="site" objname="pt"/>
    <insidesite site="z3" objtype="site" objname="pt"/>
    <insidesite site="z4" objtype="site" objname="pt"/>
    <insidesite site="z5" objtype="site" objname="pt"/>
  </sensor>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = mjtpu.put_model(mjm)
  fwd = jax.jit(mjtpu.forward)
  hits = 0
  for pos in (
      [0, 0, 1.2], [0.05, 0.1, 1.35], [1.1, 0, 1.1], [2.1, 0, 1.15],
      [3, 0.05, 1.45], [3, 0, 1.55], [4.1, 0.1, 1.1], [4.2, 0.2, 1.2],
  ):
    mjd.qpos[0:3] = pos
    mujoco.mj_forward(mjm, mjd)
    d = mjtpu.make_data(m).replace(qpos=jnp.asarray(np.array(mjd.qpos)))
    d = fwd(m, d)
    np.testing.assert_allclose(
        np.asarray(d.sensordata), mjd.sensordata, atol=0, err_msg=str(pos)
    )
    hits += mjd.sensordata.sum()
  assert hits >= 5


def test_accelerometer_static_body_zero():
  """mj_objectAcceleration reads 0 for objects in the WORLD's weld subtree
  even though cacc carries the -gravity base; a body welded to a MOVING
  body follows cacc normally (oracle-probed against C 3.10)."""
  xml = """<mujoco><worldbody>
    <geom type="plane" size="5 5 .1"/>
    <body name="ball" pos="0 0 0.09"><freejoint/><geom type="sphere" size="0.1"/>
      <site name="imu_free"/>
      <body name="rider" pos="0 0 0.1"><geom type="sphere" size="0.03"/>
        <site name="imu_rider"/></body>
    </body>
    <body name="fixed" pos="1 0 1"><geom type="sphere" size="0.1"/>
      <site name="imu_static"/></body>
  </worldbody>
  <sensor>
    <accelerometer site="imu_free"/>
    <accelerometer site="imu_rider"/>
    <accelerometer site="imu_static"/>
    <framelinacc objtype="site" objname="imu_static"/>
  </sensor></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  for _ in range(300):  # settle onto the plane
    mujoco.mj_step(mjm, mjd)
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  d = mjtpu.forward(m, d)
  np.testing.assert_allclose(
      np.asarray(d.sensordata), mjd.sensordata, atol=1e-8
  )
  # sanity on the semantics themselves: resting free body reads +g,
  # welded-to-world reads zero
  assert abs(mjd.sensordata[2] - 9.81) < 1e-6
  assert abs(np.asarray(d.sensordata)[8]) < 1e-12


def test_touch_zone_filtering():
  """TOUCH sums only contacts whose point lies INSIDE the site volume
  (C's zone test): a box site over one end of a resting capsule reads
  that end's force; a whole-body box reads both; a sphere site over the
  other end reads the other (oracle-probed semantics)."""
  xml = """<mujoco><worldbody>
    <geom type="plane" size="5 5 .1"/>
    <body pos="0 0 0.099">
      <freejoint/>
      <geom type="capsule" fromto="-0.3 0 0 0.3 0 0" size="0.1"/>
      <site name="s_end" type="box" pos="0.25 0 0" size="0.1 0.12 0.12"/>
      <site name="s_all" type="box" pos="0 0 0" size="0.5 0.2 0.2"/>
      <site name="s_sph" type="sphere" pos="-0.3 0 -0.05" size="0.08"/>
    </body></worldbody>
  <sensor><touch site="s_end"/><touch site="s_all"/><touch site="s_sph"/></sensor>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  d = mjtpu.forward(m, d)
  np.testing.assert_allclose(
      np.asarray(d.sensordata), mjd.sensordata, rtol=1e-9, atol=1e-9
  )
  # semantics sanity: end reads half of all
  assert abs(mjd.sensordata[0] * 2 - mjd.sensordata[1]) < 1e-6
