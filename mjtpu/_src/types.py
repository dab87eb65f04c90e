"""Core data model: enums + Option/Statistic/Model/Contact/Data pytrees.

Reference capability map: mujoco_torch/_src/types.py (Model/Data/Option/
Contact + ~25 enums).  The TPU-native design differs structurally:

  * Fields that the physics math consumes on-device are ``jax.Array`` pytree
    leaves (traced under jit — changing values never retraces).
  * Fields that drive *structure* — sizes, index tables, enum codes — are
    static numpy/int metadata living in the treedef aux (see dataclasses.py).
    All of the reference's derived-precompute machinery (device.py:632-884,
    scan caches, UnbatchedTensor) collapses into "plain python/numpy over
    static fields at trace time".
  * Enum values are sourced from the installed ``mujoco`` bindings so they
    can never drift from the host compiler that produces MjModel.

Data remains a pure array pytree so ``jax.vmap``/sharding treat every leaf
uniformly; constraint-dimension sizes are functions of Model
(``constraint_sizes``), not Data fields.
"""

from __future__ import annotations

import enum

import jax
import mujoco
import numpy as np

from mjtpu._src.dataclasses import mjstruct, static

# ---------------------------------------------------------------------------
# constants mirroring MuJoCo engine internals
# ---------------------------------------------------------------------------

MINVAL = mujoco.mjMINVAL
NREF = mujoco.mjNREF
NIMP = mujoco.mjNIMP
MAXVAL = 1e10


class DisableBit(enum.IntFlag):
  """Option disable flags (mjtDisableBit, MuJoCo 3.10 layout: the old
  PASSIVE bit is split into SPRING and DAMPER)."""

  CONSTRAINT = mujoco.mjtDisableBit.mjDSBL_CONSTRAINT
  EQUALITY = mujoco.mjtDisableBit.mjDSBL_EQUALITY
  FRICTIONLOSS = mujoco.mjtDisableBit.mjDSBL_FRICTIONLOSS
  LIMIT = mujoco.mjtDisableBit.mjDSBL_LIMIT
  CONTACT = mujoco.mjtDisableBit.mjDSBL_CONTACT
  SPRING = mujoco.mjtDisableBit.mjDSBL_SPRING
  DAMPER = mujoco.mjtDisableBit.mjDSBL_DAMPER
  PASSIVE = mujoco.mjtDisableBit.mjDSBL_SPRING | mujoco.mjtDisableBit.mjDSBL_DAMPER
  GRAVITY = mujoco.mjtDisableBit.mjDSBL_GRAVITY
  CLAMPCTRL = mujoco.mjtDisableBit.mjDSBL_CLAMPCTRL
  WARMSTART = mujoco.mjtDisableBit.mjDSBL_WARMSTART
  FILTERPARENT = mujoco.mjtDisableBit.mjDSBL_FILTERPARENT
  ACTUATION = mujoco.mjtDisableBit.mjDSBL_ACTUATION
  REFSAFE = mujoco.mjtDisableBit.mjDSBL_REFSAFE
  SENSOR = mujoco.mjtDisableBit.mjDSBL_SENSOR
  MIDPHASE = mujoco.mjtDisableBit.mjDSBL_MIDPHASE
  EULERDAMP = mujoco.mjtDisableBit.mjDSBL_EULERDAMP
  AUTORESET = mujoco.mjtDisableBit.mjDSBL_AUTORESET
  NATIVECCD = mujoco.mjtDisableBit.mjDSBL_NATIVECCD


class EnableBit(enum.IntFlag):
  """Option enable flags (mjtEnableBit)."""

  OVERRIDE = mujoco.mjtEnableBit.mjENBL_OVERRIDE
  ENERGY = mujoco.mjtEnableBit.mjENBL_ENERGY
  FWDINV = mujoco.mjtEnableBit.mjENBL_FWDINV
  INVDISCRETE = mujoco.mjtEnableBit.mjENBL_INVDISCRETE


class JointType(enum.IntEnum):
  """Joint types (mjtJoint)."""

  FREE = mujoco.mjtJoint.mjJNT_FREE
  BALL = mujoco.mjtJoint.mjJNT_BALL
  SLIDE = mujoco.mjtJoint.mjJNT_SLIDE
  HINGE = mujoco.mjtJoint.mjJNT_HINGE

  def dof_width(self) -> int:
    return {0: 6, 1: 3, 2: 1, 3: 1}[self.value]

  def qpos_width(self) -> int:
    return {0: 7, 1: 4, 2: 1, 3: 1}[self.value]


class IntegratorType(enum.IntEnum):
  """Integrator types (mjtIntegrator)."""

  EULER = mujoco.mjtIntegrator.mjINT_EULER
  RK4 = mujoco.mjtIntegrator.mjINT_RK4
  IMPLICIT = mujoco.mjtIntegrator.mjINT_IMPLICIT
  IMPLICITFAST = mujoco.mjtIntegrator.mjINT_IMPLICITFAST


class GeomType(enum.IntEnum):
  """Geom types (mjtGeom). Ellipsoid/cylinder collisions unsupported (parity
  with reference feature matrix, SURVEY.md §2.6) though they raycast fine."""

  PLANE = mujoco.mjtGeom.mjGEOM_PLANE
  HFIELD = mujoco.mjtGeom.mjGEOM_HFIELD
  SPHERE = mujoco.mjtGeom.mjGEOM_SPHERE
  CAPSULE = mujoco.mjtGeom.mjGEOM_CAPSULE
  ELLIPSOID = mujoco.mjtGeom.mjGEOM_ELLIPSOID
  CYLINDER = mujoco.mjtGeom.mjGEOM_CYLINDER
  BOX = mujoco.mjtGeom.mjGEOM_BOX
  MESH = mujoco.mjtGeom.mjGEOM_MESH


class ConeType(enum.IntEnum):
  """Friction cone types (mjtCone)."""

  PYRAMIDAL = mujoco.mjtCone.mjCONE_PYRAMIDAL
  ELLIPTIC = mujoco.mjtCone.mjCONE_ELLIPTIC


class JacobianType(enum.IntEnum):
  """Jacobian types (mjtJacobian)."""

  DENSE = mujoco.mjtJacobian.mjJAC_DENSE
  SPARSE = mujoco.mjtJacobian.mjJAC_SPARSE
  AUTO = mujoco.mjtJacobian.mjJAC_AUTO


class SolverType(enum.IntEnum):
  """Constraint solver types (mjtSolver). PGS unsupported."""

  CG = mujoco.mjtSolver.mjSOL_CG
  NEWTON = mujoco.mjtSolver.mjSOL_NEWTON


class EqType(enum.IntEnum):
  """Equality constraint types (mjtEq). Flex/distance unsupported."""

  CONNECT = mujoco.mjtEq.mjEQ_CONNECT
  WELD = mujoco.mjtEq.mjEQ_WELD
  JOINT = mujoco.mjtEq.mjEQ_JOINT
  TENDON = mujoco.mjtEq.mjEQ_TENDON


class WrapType(enum.IntEnum):
  """Tendon wrap types (mjtWrap)."""

  JOINT = mujoco.mjtWrap.mjWRAP_JOINT
  PULLEY = mujoco.mjtWrap.mjWRAP_PULLEY
  SITE = mujoco.mjtWrap.mjWRAP_SITE
  SPHERE = mujoco.mjtWrap.mjWRAP_SPHERE
  CYLINDER = mujoco.mjtWrap.mjWRAP_CYLINDER


class TrnType(enum.IntEnum):
  """Actuator transmission types (mjtTrn)."""

  JOINT = mujoco.mjtTrn.mjTRN_JOINT
  JOINTINPARENT = mujoco.mjtTrn.mjTRN_JOINTINPARENT
  SLIDERCRANK = mujoco.mjtTrn.mjTRN_SLIDERCRANK
  SITE = mujoco.mjtTrn.mjTRN_SITE
  TENDON = mujoco.mjtTrn.mjTRN_TENDON
  BODY = mujoco.mjtTrn.mjTRN_BODY  # adhesion


class DynType(enum.IntEnum):
  """Actuator dynamics types (mjtDyn)."""

  NONE = mujoco.mjtDyn.mjDYN_NONE
  INTEGRATOR = mujoco.mjtDyn.mjDYN_INTEGRATOR
  FILTER = mujoco.mjtDyn.mjDYN_FILTER
  FILTEREXACT = mujoco.mjtDyn.mjDYN_FILTEREXACT
  MUSCLE = mujoco.mjtDyn.mjDYN_MUSCLE


class GainType(enum.IntEnum):
  """Actuator gain types (mjtGain)."""

  FIXED = mujoco.mjtGain.mjGAIN_FIXED
  AFFINE = mujoco.mjtGain.mjGAIN_AFFINE
  MUSCLE = mujoco.mjtGain.mjGAIN_MUSCLE


class BiasType(enum.IntEnum):
  """Actuator bias types (mjtBias)."""

  NONE = mujoco.mjtBias.mjBIAS_NONE
  AFFINE = mujoco.mjtBias.mjBIAS_AFFINE
  MUSCLE = mujoco.mjtBias.mjBIAS_MUSCLE


class ConstraintType(enum.IntEnum):
  """Constraint row types (mjtConstraint)."""

  EQUALITY = mujoco.mjtConstraint.mjCNSTR_EQUALITY
  FRICTION_DOF = mujoco.mjtConstraint.mjCNSTR_FRICTION_DOF
  FRICTION_TENDON = mujoco.mjtConstraint.mjCNSTR_FRICTION_TENDON
  LIMIT_JOINT = mujoco.mjtConstraint.mjCNSTR_LIMIT_JOINT
  LIMIT_TENDON = mujoco.mjtConstraint.mjCNSTR_LIMIT_TENDON
  CONTACT_FRICTIONLESS = mujoco.mjtConstraint.mjCNSTR_CONTACT_FRICTIONLESS
  CONTACT_PYRAMIDAL = mujoco.mjtConstraint.mjCNSTR_CONTACT_PYRAMIDAL
  CONTACT_ELLIPTIC = mujoco.mjtConstraint.mjCNSTR_CONTACT_ELLIPTIC


class CamLightType(enum.IntEnum):
  """Camera/light tracking modes (mjtCamLight)."""

  FIXED = mujoco.mjtCamLight.mjCAMLIGHT_FIXED
  TRACK = mujoco.mjtCamLight.mjCAMLIGHT_TRACK
  TRACKCOM = mujoco.mjtCamLight.mjCAMLIGHT_TRACKCOM
  TARGETBODY = mujoco.mjtCamLight.mjCAMLIGHT_TARGETBODY
  TARGETBODYCOM = mujoco.mjtCamLight.mjCAMLIGHT_TARGETBODYCOM


class SensorType(enum.IntEnum):
  """Sensor types (mjtSensor) — the subset the engine computes."""

  MAGNETOMETER = mujoco.mjtSensor.mjSENS_MAGNETOMETER
  RANGEFINDER = mujoco.mjtSensor.mjSENS_RANGEFINDER
  JOINTPOS = mujoco.mjtSensor.mjSENS_JOINTPOS
  TENDONPOS = mujoco.mjtSensor.mjSENS_TENDONPOS
  ACTUATORPOS = mujoco.mjtSensor.mjSENS_ACTUATORPOS
  BALLQUAT = mujoco.mjtSensor.mjSENS_BALLQUAT
  FRAMEPOS = mujoco.mjtSensor.mjSENS_FRAMEPOS
  FRAMEXAXIS = mujoco.mjtSensor.mjSENS_FRAMEXAXIS
  FRAMEYAXIS = mujoco.mjtSensor.mjSENS_FRAMEYAXIS
  FRAMEZAXIS = mujoco.mjtSensor.mjSENS_FRAMEZAXIS
  FRAMEQUAT = mujoco.mjtSensor.mjSENS_FRAMEQUAT
  SUBTREECOM = mujoco.mjtSensor.mjSENS_SUBTREECOM
  CLOCK = mujoco.mjtSensor.mjSENS_CLOCK
  VELOCIMETER = mujoco.mjtSensor.mjSENS_VELOCIMETER
  GYRO = mujoco.mjtSensor.mjSENS_GYRO
  JOINTVEL = mujoco.mjtSensor.mjSENS_JOINTVEL
  TENDONVEL = mujoco.mjtSensor.mjSENS_TENDONVEL
  ACTUATORVEL = mujoco.mjtSensor.mjSENS_ACTUATORVEL
  BALLANGVEL = mujoco.mjtSensor.mjSENS_BALLANGVEL
  SUBTREELINVEL = mujoco.mjtSensor.mjSENS_SUBTREELINVEL
  SUBTREEANGMOM = mujoco.mjtSensor.mjSENS_SUBTREEANGMOM
  FRAMELINVEL = mujoco.mjtSensor.mjSENS_FRAMELINVEL
  FRAMEANGVEL = mujoco.mjtSensor.mjSENS_FRAMEANGVEL
  ACCELEROMETER = mujoco.mjtSensor.mjSENS_ACCELEROMETER
  FORCE = mujoco.mjtSensor.mjSENS_FORCE
  TORQUE = mujoco.mjtSensor.mjSENS_TORQUE
  ACTUATORFRC = mujoco.mjtSensor.mjSENS_ACTUATORFRC
  JOINTACTFRC = mujoco.mjtSensor.mjSENS_JOINTACTFRC
  FRAMELINACC = mujoco.mjtSensor.mjSENS_FRAMELINACC
  FRAMEANGACC = mujoco.mjtSensor.mjSENS_FRAMEANGACC
  TOUCH = mujoco.mjtSensor.mjSENS_TOUCH
  E_POTENTIAL = mujoco.mjtSensor.mjSENS_E_POTENTIAL
  E_KINETIC = mujoco.mjtSensor.mjSENS_E_KINETIC
  CAMPROJECTION = mujoco.mjtSensor.mjSENS_CAMPROJECTION
  INSIDESITE = mujoco.mjtSensor.mjSENS_INSIDESITE
  GEOMDIST = mujoco.mjtSensor.mjSENS_GEOMDIST
  GEOMNORMAL = mujoco.mjtSensor.mjSENS_GEOMNORMAL
  GEOMFROMTO = mujoco.mjtSensor.mjSENS_GEOMFROMTO
  JOINTLIMITPOS = mujoco.mjtSensor.mjSENS_JOINTLIMITPOS
  JOINTLIMITVEL = mujoco.mjtSensor.mjSENS_JOINTLIMITVEL
  JOINTLIMITFRC = mujoco.mjtSensor.mjSENS_JOINTLIMITFRC
  TENDONLIMITPOS = mujoco.mjtSensor.mjSENS_TENDONLIMITPOS
  TENDONLIMITVEL = mujoco.mjtSensor.mjSENS_TENDONLIMITVEL
  TENDONLIMITFRC = mujoco.mjtSensor.mjSENS_TENDONLIMITFRC
  # version-gated: added in MuJoCo 3.1+; -3 sentinel never matches a model
  TENDONACTFRC = getattr(mujoco.mjtSensor, "mjSENS_TENDONACTFRC", -3)
  # version-gated: added in MuJoCo 3.3 (match+reduce contact query sensor)
  CONTACT = getattr(mujoco.mjtSensor, "mjSENS_CONTACT", -4)


class ObjType(enum.IntEnum):
  """Object types referenced by sensors/cameras (mjtObj)."""

  UNKNOWN = mujoco.mjtObj.mjOBJ_UNKNOWN
  BODY = mujoco.mjtObj.mjOBJ_BODY
  XBODY = mujoco.mjtObj.mjOBJ_XBODY
  JOINT = mujoco.mjtObj.mjOBJ_JOINT
  GEOM = mujoco.mjtObj.mjOBJ_GEOM
  SITE = mujoco.mjtObj.mjOBJ_SITE
  CAMERA = mujoco.mjtObj.mjOBJ_CAMERA
  ACTUATOR = mujoco.mjtObj.mjOBJ_ACTUATOR
  SENSOR = mujoco.mjtObj.mjOBJ_SENSOR


class DataType(enum.IntEnum):
  """Sensor data types (mjtDataType)."""

  REAL = mujoco.mjtDataType.mjDATATYPE_REAL
  POSITIVE = mujoco.mjtDataType.mjDATATYPE_POSITIVE
  AXIS = mujoco.mjtDataType.mjDATATYPE_AXIS
  QUATERNION = mujoco.mjtDataType.mjDATATYPE_QUATERNION


# ---------------------------------------------------------------------------
# structs
# ---------------------------------------------------------------------------


@mjstruct
class ConvexMesh:
  """Host-side convex hull data for one mesh/box/prism (all static numpy).

  Baked into collision kernels as trace-time constants; the JAX analog of the
  reference's mesh.py padded arrays (mujoco_torch/_src/mesh.py:165-447).
  """

  vert: np.ndarray = static()            # (nvert, 3)
  face: np.ndarray = static()            # (nface, max_face_vert) vert indices, padded by repeat
  face_normal: np.ndarray = static()     # (nface, 3)
  edge: np.ndarray = static()            # (nedge, 2) vert indices of unique edges
  edge_face_normal: np.ndarray = static()  # (nedge, 2, 3) normals of the two adjacent faces


@mjstruct
class Option:
  """Physics options (mjOption).  Enum/flag/iteration fields are static —
  they select code paths at trace time (reference: types.py:503-557)."""

  timestep: jax.Array
  impratio: jax.Array
  tolerance: jax.Array
  ls_tolerance: jax.Array
  gravity: jax.Array
  wind: jax.Array
  magnetic: jax.Array
  density: jax.Array
  viscosity: jax.Array
  # o_* only used with EnableBit.OVERRIDE
  o_margin: jax.Array
  o_solref: jax.Array
  o_solimp: jax.Array
  integrator: IntegratorType = static()
  cone: ConeType = static()
  jacobian: JacobianType = static()
  solver: SolverType = static()
  iterations: int = static()
  ls_iterations: int = static()
  disableflags: DisableBit = static()
  enableflags: EnableBit = static()
  has_fluid_params: bool = static()


@mjstruct
class Statistic:
  """Model statistics (mjStatistic)."""

  meaninertia: jax.Array


@mjstruct
class Model:
  """Static scene description (mjModel as a pytree).

  jax.Array fields are traced; numpy/int fields are trace-time structure
  (see module docstring).  Field semantics match mjModel 1:1.
  """

  # ---- sizes (static) ----
  nq: int = static()
  nv: int = static()
  nu: int = static()
  na: int = static()
  nbody: int = static()
  njnt: int = static()
  ngeom: int = static()
  nsite: int = static()
  ncam: int = static()
  nlight: int = static()
  nmesh: int = static()
  nmeshvert: int = static()
  nmeshface: int = static()
  nhfield: int = static()
  nhfielddata: int = static()
  npair: int = static()
  nexclude: int = static()
  neq: int = static()
  ntendon: int = static()
  nwrap: int = static()
  nsensor: int = static()
  nsensordata: int = static()
  nM: int = static()
  nmocap: int = static(0)
  # ---- options / statistics ----
  opt: Option = None
  stat: Statistic = None
  # ---- qpos defaults ----
  qpos0: jax.Array = None
  qpos_spring: jax.Array = None
  # ---- bodies ----
  body_parentid: np.ndarray = static(None)
  body_mocapid: np.ndarray = static(None)
  body_rootid: np.ndarray = static(None)
  body_weldid: np.ndarray = static(None)
  body_jntnum: np.ndarray = static(None)
  body_jntadr: np.ndarray = static(None)
  body_dofnum: np.ndarray = static(None)
  body_dofadr: np.ndarray = static(None)
  body_geomnum: np.ndarray = static(None)
  body_geomadr: np.ndarray = static(None)
  body_pos: jax.Array = None
  body_quat: jax.Array = None
  body_ipos: jax.Array = None
  body_iquat: jax.Array = None
  body_mass: jax.Array = None
  body_subtreemass: jax.Array = None
  body_inertia: jax.Array = None
  body_gravcomp: jax.Array = None
  body_invweight0: jax.Array = None
  # ---- joints ----
  jnt_type: np.ndarray = static(None)
  jnt_qposadr: np.ndarray = static(None)
  jnt_dofadr: np.ndarray = static(None)
  jnt_bodyid: np.ndarray = static(None)
  jnt_limited: np.ndarray = static(None)
  jnt_actfrclimited: np.ndarray = static(None)
  jnt_actgravcomp: np.ndarray = static(None)
  jnt_solref: jax.Array = None
  jnt_solimp: jax.Array = None
  jnt_pos: jax.Array = None
  jnt_axis: jax.Array = None
  jnt_stiffness: jax.Array = None
  jnt_range: jax.Array = None
  jnt_actfrcrange: jax.Array = None
  jnt_margin: jax.Array = None
  # ---- dofs ----
  dof_bodyid: np.ndarray = static(None)
  dof_jntid: np.ndarray = static(None)
  dof_parentid: np.ndarray = static(None)
  dof_Madr: np.ndarray = static(None)
  dof_simplenum: np.ndarray = static(None)
  dof_solref: jax.Array = None
  dof_solimp: jax.Array = None
  dof_frictionloss: jax.Array = None
  dof_armature: jax.Array = None
  dof_damping: jax.Array = None
  dof_invweight0: jax.Array = None
  dof_M0: jax.Array = None
  # ---- geoms ----
  geom_type: np.ndarray = static(None)
  geom_contype: np.ndarray = static(None)
  geom_conaffinity: np.ndarray = static(None)
  geom_condim: np.ndarray = static(None)
  geom_bodyid: np.ndarray = static(None)
  geom_dataid: np.ndarray = static(None)
  geom_group: np.ndarray = static(None)
  geom_matid: np.ndarray = static(None)
  geom_priority: np.ndarray = static(None)
  # ---- materials / textures (render-only; host-static) ----
  mat_texid: np.ndarray = static(None)      # (nmat, nroles) role 1 = RGB
  mat_texrepeat: np.ndarray = static(None)  # (nmat, 2)
  mat_texuniform: np.ndarray = static(None)
  mat_rgba: np.ndarray = static(None)
  tex_type: np.ndarray = static(None)       # 2d / cube / skybox
  tex_adr: np.ndarray = static(None)
  tex_height: np.ndarray = static(None)
  tex_width: np.ndarray = static(None)
  tex_nchannel: np.ndarray = static(None)
  tex_data: np.ndarray = static(None)       # flat uint8
  geom_solmix: jax.Array = None
  geom_solref: jax.Array = None
  geom_solimp: jax.Array = None
  geom_size: jax.Array = None
  geom_size_np: np.ndarray = static(None)  # host copy: hull baking / grouping
  geom_fluid_np: np.ndarray = static(None)  # host copy: ellipsoid-fluid gating
  geom_rbound: jax.Array = None
  geom_rbound_np: np.ndarray = static(None)  # host copy: hfield subgrid sizing
  geom_pos: jax.Array = None
  geom_quat: jax.Array = None
  geom_friction: jax.Array = None
  geom_margin: jax.Array = None
  geom_gap: jax.Array = None
  geom_fluid: jax.Array = None
  geom_rgba: jax.Array = None
  # ---- sites ----
  site_bodyid: np.ndarray = static(None)
  site_type: np.ndarray = static(None)
  site_size: jax.Array = None
  site_pos: jax.Array = None
  site_quat: jax.Array = None
  # ---- cameras / lights ----
  cam_mode: np.ndarray = static(None)
  cam_bodyid: np.ndarray = static(None)
  cam_targetbodyid: np.ndarray = static(None)
  cam_pos: jax.Array = None
  cam_quat: jax.Array = None
  cam_poscom0: jax.Array = None
  cam_pos0: jax.Array = None
  cam_mat0: jax.Array = None
  cam_fovy: np.ndarray = static(None)
  cam_resolution: np.ndarray = static(None)
  cam_sensorsize: np.ndarray = static(None)
  cam_intrinsic: np.ndarray = static(None)
  light_mode: np.ndarray = static(None)
  light_bodyid: np.ndarray = static(None)
  light_targetbodyid: np.ndarray = static(None)
  light_type: np.ndarray = static(None)
  light_castshadow: np.ndarray = static(None)
  light_active: np.ndarray = static(None)
  light_pos: jax.Array = None
  light_dir: jax.Array = None
  light_poscom0: jax.Array = None
  light_pos0: jax.Array = None
  light_dir0: jax.Array = None
  light_diffuse: jax.Array = None
  light_ambient: jax.Array = None
  light_specular: jax.Array = None
  light_attenuation: jax.Array = None
  light_cutoff: jax.Array = None
  light_exponent: jax.Array = None
  # ---- meshes ----
  mesh_vertadr: np.ndarray = static(None)
  mesh_vertnum: np.ndarray = static(None)
  mesh_faceadr: np.ndarray = static(None)
  mesh_facenum: np.ndarray = static(None)
  mesh_vert: np.ndarray = static(None)     # host copy for hull/ray precompute
  mesh_face: np.ndarray = static(None)
  mesh_convex: tuple = static(None)        # tuple[ConvexMesh | None] per mesh
  # ---- height fields ----
  hfield_adr: np.ndarray = static(None)
  hfield_nrow: np.ndarray = static(None)
  hfield_ncol: np.ndarray = static(None)
  hfield_size: np.ndarray = static(None)
  hfield_data: jax.Array = None
  # ---- predefined / excluded collision pairs ----
  pair_dim: np.ndarray = static(None)
  pair_geom1: np.ndarray = static(None)
  pair_geom2: np.ndarray = static(None)
  pair_signature: np.ndarray = static(None)
  pair_solref: jax.Array = None
  pair_solreffriction: jax.Array = None
  pair_solimp: jax.Array = None
  pair_margin: jax.Array = None
  pair_gap: jax.Array = None
  pair_friction: jax.Array = None
  exclude_signature: np.ndarray = static(None)
  # ---- equality constraints ----
  eq_type: np.ndarray = static(None)
  eq_obj1id: np.ndarray = static(None)
  eq_obj2id: np.ndarray = static(None)
  eq_objtype: np.ndarray = static(None)
  eq_active0: np.ndarray = static(None)
  eq_solref: jax.Array = None
  eq_solimp: jax.Array = None
  eq_data: jax.Array = None
  # ---- tendons ----
  tendon_adr: np.ndarray = static(None)
  tendon_num: np.ndarray = static(None)
  tendon_limited: np.ndarray = static(None)
  tendon_solref_lim: jax.Array = None
  tendon_solimp_lim: jax.Array = None
  tendon_solref_fri: jax.Array = None
  tendon_solimp_fri: jax.Array = None
  tendon_range: jax.Array = None
  tendon_margin: jax.Array = None
  tendon_stiffness: jax.Array = None
  tendon_damping: jax.Array = None
  tendon_armature: jax.Array = None
  tendon_frictionloss: jax.Array = None
  tendon_lengthspring: jax.Array = None
  tendon_length0: jax.Array = None
  tendon_invweight0: jax.Array = None
  wrap_type: np.ndarray = static(None)
  wrap_objid: np.ndarray = static(None)
  wrap_prm: np.ndarray = static(None)
  # ---- actuators ----
  actuator_trntype: np.ndarray = static(None)
  actuator_dyntype: np.ndarray = static(None)
  actuator_gaintype: np.ndarray = static(None)
  actuator_biastype: np.ndarray = static(None)
  actuator_trnid: np.ndarray = static(None)
  actuator_actadr: np.ndarray = static(None)
  actuator_actnum: np.ndarray = static(None)
  actuator_ctrllimited: np.ndarray = static(None)
  actuator_forcelimited: np.ndarray = static(None)
  actuator_actlimited: np.ndarray = static(None)
  actuator_actearly: np.ndarray = static(None)
  actuator_dynprm: jax.Array = None
  actuator_gainprm: jax.Array = None
  actuator_biasprm: jax.Array = None
  actuator_ctrlrange: jax.Array = None
  actuator_forcerange: jax.Array = None
  actuator_actrange: jax.Array = None
  actuator_gear: jax.Array = None
  actuator_cranklength: jax.Array = None
  actuator_acc0: jax.Array = None
  actuator_lengthrange: jax.Array = None
  # model-constant (nu, nv) moment matrix, baked at put_model time when every
  # actuator is a scalar-joint transmission (reference device.py:588-629 —
  # there the moment depends on Data only for tendon/site/ball/free); None
  # when any transmission is Data-dependent.  Static numpy → an XLA constant.
  actuator_static_moment: np.ndarray = static(None)
  # ---- sensors ----
  sensor_type: np.ndarray = static(None)
  sensor_datatype: np.ndarray = static(None)
  sensor_needstage: np.ndarray = static(None)
  sensor_objtype: np.ndarray = static(None)
  sensor_objid: np.ndarray = static(None)
  sensor_reftype: np.ndarray = static(None)
  sensor_refid: np.ndarray = static(None)
  sensor_dim: np.ndarray = static(None)
  sensor_adr: np.ndarray = static(None)
  sensor_intprm: np.ndarray = static(None)  # CONTACT: [dataspec, reduce, num]
  sensor_cutoff: jax.Array = None
  # ---- custom numerics / names ----
  numeric_adr: np.ndarray = static(None)
  numeric_data: np.ndarray = static(None)
  name_numericadr: np.ndarray = static(None)
  names: bytes = static(None)
  # ---- derived static structure (computed once at put_model; the JAX analog
  # of the reference's device.py:632-884 precompute pass) ----
  friction_dofid: np.ndarray = static(None)   # dofs with frictionloss > 0
  # (njnt,)/(ntendon,) bool: range narrower than 2*margin, so C can emit
  # BOTH the lower and upper limit rows at once — such objects get two
  # static rows; all others one (host precompute; see support.count_constraints)
  jnt_limit_two_sided: np.ndarray = static(None)
  tendon_limit_two_sided: np.ndarray = static(None)
  friction_tenid: np.ndarray = static(None)   # tendons with frictionloss > 0
  has_gravcomp: bool = static(False)          # any body_gravcomp > 0
  has_dof_damping: bool = static(False)       # any dof_damping > 0
  has_tendon_damping: bool = static(False)    # any tendon_damping > 0
  has_tendon_armature: bool = static(False)   # any tendon_armature > 0
  has_jnt_spring: bool = static(False)        # any jnt_stiffness > 0
  has_tendon_spring: bool = static(False)     # any tendon_stiffness > 0


@mjstruct
class Contact:
  """Contact state (mjContact rows, structure-of-arrays over ncon)."""

  dist: jax.Array          # (ncon,)
  pos: jax.Array           # (ncon, 3)
  frame: jax.Array         # (ncon, 3, 3) rows: normal, tangent1, tangent2
  includemargin: jax.Array  # (ncon,)
  # detection margin (mixed margin + gap; oracle-probed 3.10 semantics —
  # gap EXTENDS detection beyond margin): a slot "exists" in C's d->contact
  # iff dist < margin.  Adhesion (TrnType.BODY) needs this: it also acts on
  # gap-band contacts (C exclude==1) that emit no efc rows.
  margin: jax.Array        # (ncon,)
  friction: jax.Array      # (ncon, 5)
  solref: jax.Array        # (ncon, NREF)
  solreffriction: jax.Array  # (ncon, NREF)
  solimp: jax.Array        # (ncon, NIMP)
  dim: jax.Array           # (ncon,) int: condim
  geom1: jax.Array         # (ncon,) int
  geom2: jax.Array         # (ncon,) int
  geom: jax.Array          # (ncon, 2) int
  efc_address: jax.Array   # (ncon,) int: first efc row of this contact

  @classmethod
  def zero(cls, ncon: int = 0, dtype=None) -> "Contact":
    import jax.numpy as jnp

    dtype = dtype or jnp.zeros(0).dtype
    return cls(
        dist=jnp.zeros(ncon, dtype),
        pos=jnp.zeros((ncon, 3), dtype),
        frame=jnp.zeros((ncon, 3, 3), dtype),
        includemargin=jnp.zeros(ncon, dtype),
        margin=jnp.zeros(ncon, dtype),
        friction=jnp.zeros((ncon, 5), dtype),
        solref=jnp.zeros((ncon, NREF), dtype),
        solreffriction=jnp.zeros((ncon, NREF), dtype),
        solimp=jnp.zeros((ncon, NIMP), dtype),
        dim=jnp.zeros(ncon, jnp.int32),
        geom1=jnp.full((ncon,), -1, jnp.int32),
        geom2=jnp.full((ncon,), -1, jnp.int32),
        geom=jnp.full((ncon, 2), -1, jnp.int32),
        efc_address=jnp.full((ncon,), -1, jnp.int32),
    )


@mjstruct
class Data:
  """Dynamic simulation state (mjData as a pure array pytree).

  Every leaf is a jax.Array so vmap/sharding apply uniformly; constraint-space
  row counts (ne/nf/nl/ncon/nefc) are static functions of Model — see
  ``mjtpu.constraint_sizes`` (reference kept them in Data, types.py:1091+).
  """

  # state
  time: jax.Array
  qpos: jax.Array
  qvel: jax.Array
  act: jax.Array
  qacc_warmstart: jax.Array
  # control
  ctrl: jax.Array
  qfrc_applied: jax.Array
  xfrc_applied: jax.Array
  eq_active: jax.Array
  # mocap bodies: user-set poses, read by kinematics (mj_kinematics
  # overrides xpos/xquat for body_mocapid >= 0; reference smooth.py:105-111)
  mocap_pos: jax.Array
  mocap_quat: jax.Array
  # dynamics
  qacc: jax.Array
  act_dot: jax.Array
  # position-stage kinematics
  xpos: jax.Array
  xquat: jax.Array
  xmat: jax.Array
  xipos: jax.Array
  ximat: jax.Array
  xanchor: jax.Array
  xaxis: jax.Array
  geom_xpos: jax.Array
  geom_xmat: jax.Array
  site_xpos: jax.Array
  site_xmat: jax.Array
  cam_xpos: jax.Array
  cam_xmat: jax.Array
  light_xpos: jax.Array
  light_xdir: jax.Array
  subtree_com: jax.Array
  cdof: jax.Array
  cinert: jax.Array
  # tendons
  ten_length: jax.Array
  ten_J: jax.Array
  ten_velocity: jax.Array
  # spatial tendon wrap points: one (2,3) world pair per sphere/cylinder
  # wrap entry (tendon_wrap.build_program order), active = wrapped this step
  ten_wrap_xpos: jax.Array
  ten_wrap_active: jax.Array
  # actuation
  actuator_length: jax.Array
  actuator_moment: jax.Array
  actuator_velocity: jax.Array
  actuator_force: jax.Array
  # mass matrix
  crb: jax.Array
  qM: jax.Array
  qLD: jax.Array
  qLDiagInv: jax.Array
  # velocity-stage
  cvel: jax.Array
  cdof_dot: jax.Array
  qfrc_bias: jax.Array
  qfrc_spring: jax.Array
  qfrc_damper: jax.Array
  qfrc_gravcomp: jax.Array
  qfrc_fluid: jax.Array
  qfrc_passive: jax.Array
  subtree_linvel: jax.Array
  subtree_angmom: jax.Array
  # constraints
  contact: Contact
  efc_J: jax.Array
  efc_pos: jax.Array
  efc_margin: jax.Array
  efc_frictionloss: jax.Array
  efc_D: jax.Array
  efc_aref: jax.Array
  efc_force: jax.Array
  # forces
  qfrc_actuator: jax.Array
  qfrc_smooth: jax.Array
  qacc_smooth: jax.Array
  qfrc_constraint: jax.Array
  qfrc_inverse: jax.Array
  # post-constraint com-based quantities
  cacc: jax.Array
  cfrc_int: jax.Array
  cfrc_ext: jax.Array
  # sensors
  sensordata: jax.Array
  # diagnostics: [potential, kinetic], filled when EnableBit.ENERGY is set
  # or an E_POTENTIAL/E_KINETIC sensor runs (mj_energyPos/mj_energyVel)
  energy: jax.Array
  # solver iterations taken (int32 scalar; C's solver_niter[0])
  solver_niter: jax.Array
  # count of _check_state non-finite/diverged resets since make_data (int32
  # scalar; the analog of C's mjWARN_BADQPOS/BADQVEL warning counters).
  # Summed over the batch it proves a throughput run was not NaN-cycling
  # behind the auto-reset (bench.py fetches it with the finite check).
  nreset: jax.Array
