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
