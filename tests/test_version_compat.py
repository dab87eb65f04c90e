"""Enum/version compatibility vs the installed mujoco bindings.

Reference capability map: mujoco_torch/test/version_compat_test.py (pyvers
implement_for dispatch across MuJoCo 3.3-3.10).  mjtpu sources enum values
directly from the installed mujoco module at import time, so the contract
to test is value agreement with the live bindings, not multi-version
dispatch."""

import mujoco
import numpy as np

from mjtpu._src import types


def test_enum_values_match_bindings():
  pairs = [
      (types.JointType.FREE, mujoco.mjtJoint.mjJNT_FREE),
      (types.JointType.BALL, mujoco.mjtJoint.mjJNT_BALL),
      (types.JointType.SLIDE, mujoco.mjtJoint.mjJNT_SLIDE),
      (types.JointType.HINGE, mujoco.mjtJoint.mjJNT_HINGE),
      (types.GeomType.PLANE, mujoco.mjtGeom.mjGEOM_PLANE),
      (types.GeomType.HFIELD, mujoco.mjtGeom.mjGEOM_HFIELD),
      (types.GeomType.SPHERE, mujoco.mjtGeom.mjGEOM_SPHERE),
      (types.GeomType.CAPSULE, mujoco.mjtGeom.mjGEOM_CAPSULE),
      (types.GeomType.BOX, mujoco.mjtGeom.mjGEOM_BOX),
      (types.GeomType.MESH, mujoco.mjtGeom.mjGEOM_MESH),
      (types.IntegratorType.EULER, mujoco.mjtIntegrator.mjINT_EULER),
      (types.IntegratorType.RK4, mujoco.mjtIntegrator.mjINT_RK4),
      (types.IntegratorType.IMPLICITFAST,
       mujoco.mjtIntegrator.mjINT_IMPLICITFAST),
      (types.ConeType.PYRAMIDAL, mujoco.mjtCone.mjCONE_PYRAMIDAL),
      (types.ConeType.ELLIPTIC, mujoco.mjtCone.mjCONE_ELLIPTIC),
      (types.SolverType.CG, mujoco.mjtSolver.mjSOL_CG),
      (types.SolverType.NEWTON, mujoco.mjtSolver.mjSOL_NEWTON),
      (types.EqType.CONNECT, mujoco.mjtEq.mjEQ_CONNECT),
      (types.EqType.WELD, mujoco.mjtEq.mjEQ_WELD),
      (types.EqType.JOINT, mujoco.mjtEq.mjEQ_JOINT),
      (types.TrnType.JOINT, mujoco.mjtTrn.mjTRN_JOINT),
      (types.TrnType.TENDON, mujoco.mjtTrn.mjTRN_TENDON),
      (types.DynType.NONE, mujoco.mjtDyn.mjDYN_NONE),
      (types.DynType.MUSCLE, mujoco.mjtDyn.mjDYN_MUSCLE),
      (types.SensorType.ACCELEROMETER, mujoco.mjtSensor.mjSENS_ACCELEROMETER),
      (types.SensorType.RANGEFINDER, mujoco.mjtSensor.mjSENS_RANGEFINDER),
      (types.DisableBit.CONTACT, mujoco.mjtDisableBit.mjDSBL_CONTACT),
      (types.DisableBit.GRAVITY, mujoco.mjtDisableBit.mjDSBL_GRAVITY),
  ]
  for ours, theirs in pairs:
    assert int(ours) == int(theirs), (ours, theirs)


def test_mjminval_matches():
  assert np.isclose(types.MINVAL, mujoco.mjMINVAL)


def test_version_floor():
  # engine developed against 3.10; enums are read from the live module so
  # newer versions keep working — but guard against ancient bindings
  major, minor = (int(x) for x in mujoco.__version__.split(".")[:2])
  assert (major, minor) >= (3, 3)


def test_versioned_enum_dispatch():
  """Enums added after the 3.3 floor resolve to the live value when the
  bindings have them and to a never-matching sentinel when they don't —
  so BOTH CI matrix pins exercise a real branch here (reference
  version_compat_test.py gates the same surface via implement_for)."""
  for attr, enum_val, sentinel in (
      ("mjSENS_TENDONACTFRC", types.SensorType.TENDONACTFRC, -3),
      ("mjSENS_CONTACT", types.SensorType.CONTACT, -4),
  ):
    if hasattr(mujoco.mjtSensor, attr):
      assert int(enum_val) == int(getattr(mujoco.mjtSensor, attr))
    else:
      # old pin: the sentinel can never match a real sensor_type value,
      # so put_model's check_enum rejects nothing spuriously
      assert int(enum_val) == sentinel


class _OldBindings:
  """Proxy simulating a pre-3.4 MjModel: hides fields that newer MuJoCo
  versions added, so the getattr fallbacks in put_model run under ANY
  installed pin (the old-version half of the reference's implement_for
  dispatch, types.py:29-483)."""

  _HIDDEN = ("tendon_armature", "sensor_intprm", "light_active")

  def __init__(self, mjm):
    object.__setattr__(self, "_mjm", mjm)

  def __getattr__(self, name):
    if name in self._HIDDEN:
      raise AttributeError(name)
    return getattr(self._mjm, name)


def test_old_bindings_field_fallbacks():
  """put_model on a model without tendon_armature/sensor_intprm/
  light_active (the 3.3-era layout): defaults kick in and the engine
  still steps + matches the un-hidden model exactly (those fields are
  all-zero/-default in the XML)."""
  import jax
  import jax.numpy as jnp

  import mjtpu
  from tests.conftest import load_mj

  mjm = load_mj("friction_tendon.xml")
  m_new = mjtpu.put_model(mjm)
  m_old = mjtpu.put_model(_OldBindings(mjm))

  assert not m_old.has_tendon_armature
  assert np.all(np.asarray(m_old.tendon_armature) == 0.0)
  assert np.all(np.asarray(m_old.light_active))
  np.testing.assert_array_equal(
      np.asarray(m_old.sensor_intprm), np.zeros((mjm.nsensor, 3), np.int32)
  )

  d_new = mjtpu.make_data(m_new)
  d_old = mjtpu.make_data(m_old)
  step = jax.jit(mjtpu.step)
  for _ in range(10):
    d_new = step(m_new, d_new)
    d_old = step(m_old, d_old)
  np.testing.assert_allclose(
      np.asarray(d_old.qpos), np.asarray(d_new.qpos), atol=1e-12
  )


def test_old_bindings_trajectory_matches_c():
  """Behavior-level version dispatch (reference version_compat_test.py):
  a Model built through the 3.3-era field layout must still reproduce the
  C trajectory — not merely resolve enums.  A wrong getattr default
  (light_active zeros, garbage tendon_armature) changes qM/passive forces
  and this diverges."""
  import jax
  import jax.numpy as jnp

  import mjtpu
  from tests.conftest import load_mj

  mjm = load_mj("friction_tendon.xml")
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(3)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.1, 0.1, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.1, 0.1, mjm.nv)

  m_old = mjtpu.put_model(_OldBindings(mjm))
  d = mjtpu.make_data(m_old).replace(
      qpos=jnp.asarray(np.array(mjd.qpos)),
      qvel=jnp.asarray(np.array(mjd.qvel)),
  )
  step = jax.jit(mjtpu.step)
  for _ in range(50):
    mujoco.mj_step(mjm, mjd)
    d = step(m_old, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-10)


def test_old_bindings_sensors_match_c():
  """Sensor pipeline through the 3.3-era layout (no sensor_intprm /
  light_active fields): sensordata must match C exactly.  If the
  sensor_intprm zero-default were wrong, intprm-consuming sensors would
  read garbage parameters here."""
  import jax
  import jax.numpy as jnp

  import mjtpu
  from tests.conftest import load_mj

  mjm = load_mj("sensors.xml")
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(5)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.05, 0.05, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.05, 0.05, mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  m_old = mjtpu.put_model(_OldBindings(mjm))
  d = mjtpu.make_data(m_old).replace(
      qpos=jnp.asarray(np.array(mjd.qpos)),
      qvel=jnp.asarray(np.array(mjd.qvel)),
  )
  d = jax.jit(mjtpu.forward)(m_old, d)
  np.testing.assert_allclose(
      np.asarray(d.sensordata), mjd.sensordata, atol=1e-9
  )
