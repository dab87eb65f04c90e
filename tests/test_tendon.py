"""Spatial tendon parity vs MuJoCo C (mju_wrap / mj_tendon spatial branch).

The wrap geometry contract was recovered from the C engine binary and is
validated here end-to-end through mjtpu.tendon: lengths, Jacobians, wrap
points, passive forces, constraints, transmission and trajectories at f64.
Capability-plus: the reference supports fixed tendons only
(reference smooth.py:470-497).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu


def _sphere_xml(side=None, sidepos="0 0 -1.0", extra=""):
  sideattr = f' sidesite="side"' if side else ""
  return f"""
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <body name="a" pos="-1 0 0">
      <joint type="slide" axis="1 0 0"/><joint type="slide" axis="0 0 1"/>
      <geom type="sphere" size="0.05" mass="1"/><site name="s0"/>
    </body>
    <body name="b" pos="1 0 0">
      <joint type="slide" axis="1 0 0"/><joint type="slide" axis="0 0 1"/>
      <geom type="sphere" size="0.05" mass="1"/><site name="s1"/>
    </body>
    <geom name="wg" type="sphere" size="0.25" pos="0 0 -0.3"/>
    <site name="side" pos="{sidepos}"/>
  </worldbody>
  <tendon>
    <spatial name="t0" stiffness="12" springlength="1.2" damping="0.4">
      <site site="s0"/><geom geom="wg"{sideattr}/><site site="s1"/>
    </spatial>
  </tendon>
  {extra}
</mujoco>
"""


_CYL_XML = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <body name="a" pos="-1 0.1 0">
      <joint type="slide" axis="1 0 0"/><joint type="slide" axis="0 0 1"/>
      <geom type="sphere" size="0.05" mass="1"/><site name="s0"/>
    </body>
    <body name="b" pos="1 -0.1 0">
      <joint type="slide" axis="1 0 0"/><joint type="slide" axis="0 0 1"/>
      <geom type="sphere" size="0.05" mass="1"/><site name="s1"/>
    </body>
    <geom name="wc" type="cylinder" size="0.22 1" pos="0 0 -0.25"
          euler="90 10 0"/>
    <site name="side" pos="0 0 SIDEZ"/>
  </worldbody>
  <tendon>
    <spatial name="t0" stiffness="8" springlength="1.0">
      <site site="s0"/><geom geom="wc"SIDE/><site site="s1"/>
    </spatial>
  </tendon>
</mujoco>
"""


_PULLEY_XML = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <body name="a" pos="-0.8 0 0.4">
      <joint type="slide" axis="1 0 0"/><joint type="slide" axis="0 0 1"/>
      <geom type="sphere" size="0.05" mass="1"/><site name="s0"/>
    </body>
    <body name="b" pos="0.8 0 0.4">
      <joint type="slide" axis="1 0 0"/><joint type="slide" axis="0 0 1"/>
      <geom type="sphere" size="0.05" mass="1"/><site name="s1"/>
      <site name="s2" pos="0 0 0.25"/>
    </body>
    <geom name="wg" type="sphere" size="0.2" pos="0 0 0.8"/>
    <site name="anchor" pos="0 0 0"/>
  </worldbody>
  <tendon>
    <spatial name="t0" stiffness="5" springlength="0.9">
      <site site="s0"/><geom geom="wg"/><site site="s1"/>
      <pulley divisor="2.5"/>
      <site site="anchor"/><site site="s2"/>
    </spatial>
  </tendon>
</mujoco>
"""


_MIXED_XML = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <body name="arm" pos="0 0 0.5">
      <joint name="j0" type="hinge" axis="0 1 0"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.5 0 0" mass="1"/>
      <site name="s0" pos="0.5 0 0"/>
      <body name="fore" pos="0.5 0 0">
        <joint name="j1" type="hinge" axis="0 1 0"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0.4 0 0" mass="0.5"/>
        <site name="s1" pos="0.4 0 0"/>
      </body>
    </body>
    <geom name="wg" type="cylinder" size="0.1 0.3" pos="0.5 0 0.5"
          euler="90 0 0" contype="0" conaffinity="0"/>
    <site name="ground" pos="0 0 0"/>
  </worldbody>
  <tendon>
    <spatial name="sp" stiffness="30" springlength="0.6" damping="1.0"
             range="0.2 1.4" limited="true" frictionloss="0.1">
      <site site="ground"/><geom geom="wg"/><site site="s1"/>
    </spatial>
    <fixed name="fx" stiffness="2">
      <joint joint="j0" coef="1.5"/><joint joint="j1" coef="-0.5"/>
    </fixed>
  </tendon>
  <actuator>
    <motor tendon="sp" gear="3"/>
  </actuator>
  <sensor>
    <tendonpos tendon="sp"/><tendonvel tendon="sp"/>
  </sensor>
</mujoco>
"""


def _parity(xml, nq_fuzz=40, seed=0, atol=1e-10):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = mjtpu.put_model(mjm, dtype=jnp.float64)
  rng = np.random.default_rng(seed)
  fwd = jax.jit(mjtpu.forward)
  nwrap_hits = 0
  for _ in range(nq_fuzz):
    qpos = mjm.qpos0 + rng.uniform(-0.8, 0.8, mjm.nq)
    qvel = rng.uniform(-1, 1, mjm.nv)
    mjd.qpos[:] = qpos
    mjd.qvel[:] = qvel
    mujoco.mj_forward(mjm, mjd)
    d = mjtpu.make_data(m)
    d = d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
    d = fwd(m, d)
    np.testing.assert_allclose(
        np.asarray(d.ten_length), mjd.ten_length, atol=atol)
    np.testing.assert_allclose(
        np.asarray(d.ten_J), np.asarray(mjd.ten_J).reshape(mjm.ntendon, -1),
        atol=atol)
    nwrap_hits += int(np.asarray(d.ten_wrap_active).sum()) if np.asarray(
        d.ten_wrap_active).size else 0
  return nwrap_hits, mjm


def test_sphere_no_side():
  hits, _ = _parity(_sphere_xml(side=False))
  assert hits > 0  # fuzz must exercise actual wrapping


def test_sphere_side_outside():
  hits, _ = _parity(_sphere_xml(side=True, sidepos="0 0 -1.0"))
  assert hits > 0


def test_sphere_side_inside():
  # sidesite strictly inside the wrap sphere: the inside-wrap solve
  hits, _ = _parity(_sphere_xml(side=True, sidepos="0.05 0 -0.25"))
  assert hits > 0


def test_cylinder_no_side():
  xml = _CYL_XML.replace("SIDEZ", "-1.0").replace("SIDE", "")
  hits, _ = _parity(xml)
  assert hits > 0


def test_cylinder_side_outside():
  xml = _CYL_XML.replace("SIDEZ", "-1.0").replace("SIDE", ' sidesite="side"')
  hits, _ = _parity(xml)
  assert hits > 0


def test_cylinder_side_inside():
  xml = _CYL_XML.replace("SIDEZ", "-0.3").replace("SIDE", ' sidesite="side"')
  _parity(xml)


def test_pulley_branches():
  hits, _ = _parity(_PULLEY_XML)
  assert hits > 0


def test_mixed_fixed_spatial_full_pipeline():
  """Spatial + fixed tendons, limits, friction, actuator, sensors."""
  mjm = mujoco.MjModel.from_xml_string(_MIXED_XML)
  mjd = mujoco.MjData(mjm)
  m = mjtpu.put_model(mjm, dtype=jnp.float64)
  rng = np.random.default_rng(3)
  fwd = jax.jit(mjtpu.forward)
  for _ in range(20):
    qpos = mjm.qpos0 + rng.uniform(-1.5, 1.5, mjm.nq)
    qvel = rng.uniform(-2, 2, mjm.nv)
    ctrl = rng.uniform(-1, 1, mjm.nu)
    mjd.qpos[:] = qpos
    mjd.qvel[:] = qvel
    mjd.ctrl[:] = ctrl
    mujoco.mj_forward(mjm, mjd)
    d = mjtpu.make_data(m)
    d = d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
                  ctrl=jnp.asarray(ctrl))
    d = fwd(m, d)
    np.testing.assert_allclose(
        np.asarray(d.ten_length), mjd.ten_length, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(d.ten_J), np.asarray(mjd.ten_J).reshape(mjm.ntendon, -1),
        atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(d.actuator_length), mjd.actuator_length, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(d.actuator_moment), mjd.actuator_moment.reshape(
            mjm.nu, mjm.nv), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(d.qfrc_passive), mjd.qfrc_passive, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(d.sensordata), mjd.sensordata, atol=1e-10)
    np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-7)


@pytest.mark.parametrize("xml,steps", [
    (_sphere_xml(side=False), 200),
    (_sphere_xml(side=True, sidepos="0 0 -1.0"), 200),
    (_PULLEY_XML, 200),
    (_MIXED_XML, 200),
])
def test_trajectory_parity(xml, steps):
  """Stepped trajectories stay on the C trajectory through wrap transitions."""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(11)
  mjd.qvel[:] = rng.uniform(-0.5, 0.5, mjm.nv)
  m = mjtpu.put_model(mjm, dtype=jnp.float64)
  d = mjtpu.make_data(m)
  d = d.replace(qpos=jnp.asarray(np.array(mjd.qpos)),
                qvel=jnp.asarray(np.array(mjd.qvel)))
  step = jax.jit(mjtpu.step)
  for k in range(steps):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-6)


def test_wrap_points_match_c():
  """World wrap points equal C's wrap_xpos tangent entries."""
  mjm = mujoco.MjModel.from_xml_string(_sphere_xml(side=True))
  mjd = mujoco.MjData(mjm)
  m = mjtpu.put_model(mjm, dtype=jnp.float64)
  rng = np.random.default_rng(5)
  fwd = jax.jit(mjtpu.forward)
  checked = 0
  for _ in range(30):
    qpos = mjm.qpos0 + rng.uniform(-0.8, 0.8, mjm.nq)
    mjd.qpos[:] = qpos
    mujoco.mj_forward(mjm, mjd)
    d = mjtpu.make_data(m)
    d = d.replace(qpos=jnp.asarray(qpos))
    d = fwd(m, d)
    if mjd.ten_wrapnum[0] == 4:
      assert bool(np.asarray(d.ten_wrap_active)[0])
      cpts = mjd.wrap_xpos.reshape(-1, 3)[1:3]
      np.testing.assert_allclose(
          np.asarray(d.ten_wrap_xpos)[0], cpts, atol=1e-10)
      checked += 1
    else:
      assert not bool(np.asarray(d.ten_wrap_active)[0])
  assert checked > 0


def test_fixed_tendon_regression():
  """The joint-tendon path is unchanged by the spatial split."""
  from tests.conftest import load_mj
  mjm = load_mj("friction_tendon.xml")
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(0)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.5, 0.5, mjm.nq)
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm, dtype=jnp.float64)
  d = mjtpu.make_data(m)
  d = d.replace(qpos=jnp.asarray(np.array(mjd.qpos)))
  d = mjtpu.kinematics(m, d)
  d = mjtpu.com_pos(m, d)
  d = mjtpu.tendon(m, d)
  np.testing.assert_allclose(np.asarray(d.ten_length), mjd.ten_length,
                             atol=1e-12)
  np.testing.assert_allclose(
      np.asarray(d.ten_J), np.asarray(mjd.ten_J).reshape(mjm.ntendon, -1),
      atol=1e-12)


_EQ_XML = """
<mujoco>
  <option timestep="0.004"/>
  <worldbody>
    <body name="a" pos="0 0 0.5"><joint name="j0" type="hinge" axis="0 1 0"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.4 0 0" mass="1"/>
      <site name="s0" pos="0.4 0 0"/></body>
    <body name="b" pos="1 0 0.5"><joint name="j1" type="hinge" axis="0 1 0"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0" mass="0.7"/>
      <site name="s1" pos="0.3 0 0"/></body>
    <geom name="wg" type="sphere" size="0.12" pos="0.5 0 0.2" contype="0"
          conaffinity="0"/>
    <site name="g0" pos="0 0 0"/><site name="g1" pos="1 0 0"/>
  </worldbody>
  <tendon>
    <spatial name="ta"><site site="g0"/><geom geom="wg"/><site site="s0"/></spatial>
    <spatial name="tb"><site site="g1"/><site site="s1"/></spatial>
  </tendon>
  <equality>EQ</equality>
</mujoco>
"""


@pytest.mark.parametrize("eq", [
    '<tendon tendon1="ta" tendon2="tb" polycoef="0.05 1.2 0.1 0 0"/>',
    '<tendon tendon1="ta" polycoef="0.1 0 0 0 0"/>',
])
def test_tendon_equality(eq):
  """EqType.TENDON rows: qacc and trajectory parity vs C."""
  xml = _EQ_XML.replace("EQ", eq)
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = mjtpu.put_model(mjm, dtype=jnp.float64)
  rng = np.random.default_rng(1)
  fwd = jax.jit(mjtpu.forward)
  for _ in range(15):
    qpos = mjm.qpos0 + rng.uniform(-1, 1, mjm.nq)
    qvel = rng.uniform(-2, 2, mjm.nv)
    mjd.qpos[:] = qpos
    mjd.qvel[:] = qvel
    mujoco.mj_forward(mjm, mjd)
    d = mjtpu.make_data(m).replace(qpos=jnp.asarray(qpos),
                                   qvel=jnp.asarray(qvel))
    d = fwd(m, d)
    np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-7)
  mjd2 = mujoco.MjData(mjm)
  mjd2.qvel[:] = [1.0, -0.5]
  d = mjtpu.make_data(m).replace(qpos=jnp.asarray(np.array(mjd2.qpos)),
                                 qvel=jnp.asarray(np.array(mjd2.qvel)))
  step = jax.jit(mjtpu.step)
  for _ in range(300):
    mujoco.mj_step(mjm, mjd2)
    d = step(m, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd2.qpos, atol=1e-9)
