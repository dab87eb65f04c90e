"""Per-geom ellipsoid fluid model (mj_ellipsoidFluidModel) — parity vs C.

Capability beyond the reference: mujoco_torch only implements the
inertia-box fluid model (reference passive.py:31-173).  mjtpu adds the
fluidshape='ellipsoid' per-geom model; every term was recovered exactly
against the C oracle (see passive._ellipsoid_fluid_model's docstring for
the formulas and probing method)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mjtpu

MIXED_XML = """
<mujoco>
  <option density="1.3" viscosity="0.2" wind="0.5 -0.3 0.8" gravity="0 0 -9.81"/>
  <default><geom contype="0" conaffinity="0"/></default>
  <worldbody>
    <body pos="0 0 1">
      <freejoint/>
      <geom type="ellipsoid" size="0.1 0.2 0.3" mass="1" fluidshape="ellipsoid"
            pos="0.2 -0.1 0.3" euler="20 -35 50"/>
      <geom type="capsule" size="0.05 0.2" mass="0.5" fluidshape="ellipsoid"
            pos="-0.3 0.2 0" euler="80 10 -30"/>
      <body pos="0.4 0 0">
        <joint type="ball"/>
        <geom type="box" size="0.1 0.15 0.08" mass="0.7" fluidshape="ellipsoid"
              euler="5 15 25"/>
        <body pos="0.2 0 0">
          <joint type="hinge" axis="0 1 0"/>
          <geom type="sphere" size="0.09" mass="0.3"/>
          <geom type="cylinder" size="0.04 0.12" mass="0.2" pos="0 0.1 0"
                fluidshape="ellipsoid" euler="0 45 0"/>
        </body>
      </body>
      <body pos="-0.4 0 0">
        <joint type="hinge" axis="1 0 0"/>
        <geom type="sphere" size="0.11" mass="0.4"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def test_ellipsoid_fluid_forward_exact():
  """qfrc_fluid matches C at machine precision on a mixed model: rotated
  offset fluid geoms of every supported type, one box-model-only body
  (tests the per-body dispatch), wind, viscosity, density."""
  mjm = mujoco.MjModel.from_xml_string(MIXED_XML)
  m = mjtpu.put_model(mjm)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(3)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.2, 0.2, mjm.nq)
  mujoco.mj_normalizeQuat(mjm, mjd.qpos)
  mjd.qvel[:] = rng.uniform(-1, 1, mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  d = mjtpu.make_data(m).replace(
      qpos=jnp.asarray(np.array(mjd.qpos)),
      qvel=jnp.asarray(np.array(mjd.qvel)),
  )
  d = jax.jit(mjtpu.forward)(m, d)
  np.testing.assert_allclose(
      np.asarray(d.qfrc_fluid), mjd.qfrc_fluid, rtol=1e-10, atol=1e-12
  )


def test_ellipsoid_fluid_trajectory():
  """100-step Euler trajectory parity vs C on the mixed fluid model."""
  mjm = mujoco.MjModel.from_xml_string(MIXED_XML)
  m = mjtpu.put_model(mjm)
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:] = np.random.default_rng(5).uniform(-1, 1, mjm.nv)
  d = mjtpu.make_data(m).replace(qvel=jnp.asarray(np.array(mjd.qvel)))
  step = jax.jit(mjtpu.step)
  for i in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    err = max(
        np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
        np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
    )
    assert err < 1e-10, f"diverged at step {i}: {err:.3e}"


def test_ellipsoid_fluid_implicit_integrators():
  """Implicit + ImplicitFast with ellipsoid fluid: C implements the exact
  analytic fluid derivative here (unlike its approximate box-fluid
  ImplicitFast path), and the jacfwd qDeriv matches it to bit parity —
  verified under stress (density 50, h=0.01)."""
  for integ in ("implicit", "implicitfast"):
    xml = f"""
    <mujoco>
      <option density="50" viscosity="2" timestep="0.01" integrator="{integ}"/>
      <default><geom contype="0" conaffinity="0"/></default>
      <worldbody>
        <body pos="0 0 1">
          <freejoint/>
          <geom type="ellipsoid" size="0.1 0.2 0.3" mass="1"
                fluidshape="ellipsoid" euler="20 -35 50"/>
          <body pos="0.3 0 0">
            <joint type="hinge" axis="0 1 0" damping="0.05"/>
            <geom type="capsule" size="0.04 0.15" mass="0.3"
                  fluidshape="ellipsoid"/>
          </body>
        </body>
      </worldbody>
    </mujoco>"""
    mjm = mujoco.MjModel.from_xml_string(xml)
    m = mjtpu.put_model(mjm)
    mjd = mujoco.MjData(mjm)
    mjd.qvel[:] = np.random.default_rng(2).uniform(-2, 2, mjm.nv)
    d = mjtpu.make_data(m).replace(qvel=jnp.asarray(np.array(mjd.qvel)))
    step = jax.jit(mjtpu.step)
    for i in range(100):
      mujoco.mj_step(mjm, mjd)
      d = step(m, d)
    err = max(
        np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
        np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
    )
    assert err < 1e-10, f"{integ}: err {err:.3e}"


def test_box_model_unchanged_without_flags():
  """Models without fluidshape='ellipsoid' still take the inertia-box
  path (dispatch no-op): humanoid-in-wind trajectory parity vs C."""
  xml = """
  <mujoco>
    <option density="1.2" viscosity="0.3" wind="1 0 0"/>
    <worldbody>
      <body pos="0 0 1">
        <freejoint/>
        <geom type="box" size="0.1 0.2 0.05" mass="1" contype="0" conaffinity="0"/>
      </body>
    </body></worldbody>
  </mujoco>""".replace("</body></worldbody>", "</worldbody>")
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:] = np.random.default_rng(1).uniform(-1, 1, mjm.nv)
  d = mjtpu.make_data(m).replace(qvel=jnp.asarray(np.array(mjd.qvel)))
  step = jax.jit(mjtpu.step)
  for _ in range(50):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  err = max(
      np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
      np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
  )
  assert err < 1e-10, f"box model regressed: {err:.3e}"
