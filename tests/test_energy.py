"""Energy parity vs MuJoCo C (mj_energyPos / mj_energyVel) — a capability
the reference lacks entirely.  Oracle-probed semantics: the gravity term is
gated on DisableBit.GRAVITY, the joint/tendon spring terms on
DisableBit.SPRING; kinetic energy is unconditional."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mjtpu

XML = """<mujoco>
<option gravity="0 0 -9.81">
  <flag energy="enable"/>
</option>
<worldbody>
  <body pos="0 0 1">
    <joint name="j" type="hinge" axis="0 1 0" stiffness="3" springref="0.2"
           damping="0.5"/>
    <geom type="capsule" size="0.05" fromto="0 0 0 0.4 0 0"/>
    <body pos="0.4 0 0"><joint type="ball" stiffness="2"/>
      <geom type="sphere" size="0.06" pos="0.1 0 0"/>
    </body>
  </body>
  <body pos="1 0 2"><freejoint/><geom type="box" size=".1 .1 .1"/></body>
</worldbody>
<tendon><fixed name="t" stiffness="4" springlength="0.1 0.3">
  <joint joint="j" coef="1"/></fixed></tendon>
</mujoco>"""

SENSOR_XML = XML.replace(
    "</mujoco>",
    """<sensor>
  <e_potential name="pe"/>
  <e_kinetic name="ke"/>
</sensor>
</mujoco>""",
).replace('<flag energy="enable"/>', "")


def _pair(xml, seed=0):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.3, 0.3, mjm.nq)
  mjd.qvel[:] = rng.uniform(-1, 1, mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m).replace(
      qpos=jnp.asarray(np.array(mjd.qpos)),
      qvel=jnp.asarray(np.array(mjd.qvel)),
  )
  return mjm, mjd, m, jax.jit(mjtpu.forward)(m, d)


def test_energy_parity():
  """d.energy == C's [potential, kinetic] with the energy flag enabled."""
  _, mjd, _, d = _pair(XML)
  np.testing.assert_allclose(np.asarray(d.energy), mjd.energy, atol=1e-10)
  assert abs(mjd.energy[0]) > 1.0 and abs(mjd.energy[1]) > 0.01


def test_energy_disable_gates():
  """Gravity term gated on GRAVITY disable, springs on SPRING disable."""
  for flag in ("spring", "gravity"):
    xml = XML.replace(
        '<flag energy="enable"/>', f'<flag energy="enable" {flag}="disable"/>'
    )
    _, mjd, _, d = _pair(xml)
    np.testing.assert_allclose(np.asarray(d.energy), mjd.energy, atol=1e-10)


def test_energy_sensors():
  """E_POTENTIAL / E_KINETIC sensors match C and update d.energy as a side
  effect even without the enable flag."""
  mjm, mjd, m, d = _pair(SENSOR_XML)
  np.testing.assert_allclose(
      np.asarray(d.sensordata), mjd.sensordata, atol=1e-10
  )
  # C's sensor path calls mj_energyPos/Vel, so d.energy fills without the flag
  np.testing.assert_allclose(np.asarray(d.energy), mjd.energy, atol=1e-10)
  assert not (mjm.opt.enableflags & mujoco.mjtEnableBit.mjENBL_ENERGY)


def test_energy_trajectory():
  """Energy tracks C over a 50-step damped trajectory."""
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:] = np.linspace(-1, 1, mjm.nv)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m).replace(qvel=jnp.asarray(np.array(mjd.qvel)))
  step = jax.jit(mjtpu.step)
  for i in range(50):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    np.testing.assert_allclose(
        np.asarray(d.energy), mjd.energy, atol=1e-8,
        err_msg=f"step {i}",
    )
