"""Model/Data ingestion: MjModel -> Model pytree, Data allocation, readback.

Reference capability map: mujoco_torch/_src/device.py (device_put,
_validate, _model_derived, device_get_into) + _src/io.py (make_data).  The
TPU design deletes the derived-field machinery: static numpy fields stay on
the Model and all precompute is trace-time python (SURVEY.md §7).  MuJoCo C
remains the host-side model compiler and test oracle exactly as in MJX —
it is never called inside jit.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjtpu._src import mesh as mesh_mod
from mjtpu._src import support, tendon_wrap
from mjtpu._src.types import (
    BiasType,
    ConeType,
    Contact,
    Data,
    DisableBit,
    DynType,
    EqType,
    GainType,
    IntegratorType,
    JacobianType,
    JointType,
    Model,
    NIMP,
    NREF,
    Option,
    SensorType,
    SolverType,
    Statistic,
    TrnType,
    WrapType,
)

_SUPPORTED_SENSORS = {int(s) for s in SensorType}


def _validate(m: mujoco.MjModel) -> None:
  """Rejects unsupported features (reference device.py:919-964)."""
  def check_enum(vals, enum_cls, what):
    ok = {int(e) for e in enum_cls}
    bad = [int(v) for v in np.atleast_1d(vals) if int(v) not in ok]
    if bad:
      raise NotImplementedError(f"unsupported {what}: {bad}")

  check_enum(m.opt.integrator, IntegratorType, "integrator")
  check_enum(m.opt.solver, SolverType, "solver")
  check_enum(m.opt.cone, ConeType, "cone")
  check_enum(m.eq_type, EqType, "equality constraint type")
  check_enum(m.actuator_trntype, TrnType, "actuator transmission")
  check_enum(m.actuator_dyntype, DynType, "actuator dynamics")
  check_enum(m.actuator_gaintype, GainType, "actuator gain")
  check_enum(m.actuator_biastype, BiasType, "actuator bias")
  check_enum(m.sensor_type, SensorType, "sensor type")
  # fixed (joint) and spatial (site/geom/pulley) tendons are both supported;
  # spatial wrap geometry is the exact mju_wrap contract (tendon_wrap.py)
  check_enum(m.wrap_type, WrapType, "tendon wrap type") if m.nwrap else None
  if m.nflex:
    raise NotImplementedError("flex objects are not supported")
  if m.opt.wind.any() and m.opt.density == 0 and m.opt.viscosity == 0:
    pass  # wind without medium is a no-op, allowed

  known_disable = 0
  for b in DisableBit:
    known_disable |= int(b)
  if m.opt.disableflags & ~known_disable:
    warnings.warn(
        f"unknown disable flags ignored: {m.opt.disableflags & ~known_disable:#x}"
    )


def _option(o: mujoco.MjOption, dtype) -> Option:
  f = lambda x: jnp.asarray(np.array(x), dtype=dtype)
  has_fluid = (o.density > 0) or (o.viscosity > 0) or np.any(o.wind)
  return Option(
      timestep=f(o.timestep),
      impratio=f(o.impratio),
      tolerance=f(o.tolerance),
      ls_tolerance=f(o.ls_tolerance),
      gravity=f(o.gravity),
      wind=f(o.wind),
      magnetic=f(o.magnetic),
      density=f(o.density),
      viscosity=f(o.viscosity),
      o_margin=f(o.o_margin),
      o_solref=f(o.o_solref),
      o_solimp=f(o.o_solimp),
      integrator=IntegratorType(o.integrator),
      cone=ConeType(o.cone),
      jacobian=JacobianType(o.jacobian),
      solver=SolverType(o.solver),
      iterations=int(o.iterations),
      ls_iterations=int(o.ls_iterations),
      disableflags=int(o.disableflags),
      enableflags=int(o.enableflags),
      has_fluid_params=bool(has_fluid),
  )


def put_model(m: mujoco.MjModel, dtype=None, _full_compat: bool = False) -> Model:
  """Converts an MjModel into the Model pytree (reference device_put,
  device.py:1029-1112).  Float arrays are cast to `dtype` (default: JAX's
  current default float — f32 on TPU, f64 under jax_enable_x64)."""
  _validate(m)
  dtype = dtype or jnp.zeros(0).dtype

  # note: np.array copies first — jnp.asarray can zero-copy alias live
  # MjModel buffers on the CPU backend
  f = lambda x: jnp.asarray(np.array(x), dtype=dtype)  # float arrays (traced)
  i = lambda x: np.array(x)                            # static numpy copies

  fields: dict = dict(
      nq=m.nq, nv=m.nv, nu=m.nu, na=m.na, nbody=m.nbody, njnt=m.njnt,
      ngeom=m.ngeom, nsite=m.nsite, ncam=m.ncam, nlight=m.nlight,
      nmesh=m.nmesh, nmeshvert=m.nmeshvert, nmeshface=m.nmeshface,
      nhfield=m.nhfield, nhfielddata=m.nhfielddata, npair=m.npair,
      nexclude=m.nexclude, neq=m.neq, ntendon=m.ntendon, nwrap=m.nwrap,
      nsensor=m.nsensor, nsensordata=m.nsensordata, nM=m.nM,
      nmocap=m.nmocap,
      opt=_option(m.opt, dtype),
      stat=Statistic(meaninertia=f(m.stat.meaninertia)),
      qpos0=f(m.qpos0), qpos_spring=f(m.qpos_spring),
  )

  static_names = [
      "body_parentid", "body_mocapid", "body_rootid", "body_weldid",
      "body_jntnum",
      "body_jntadr", "body_dofnum", "body_dofadr", "body_geomnum",
      "body_geomadr",
      "jnt_type", "jnt_qposadr", "jnt_dofadr", "jnt_bodyid", "jnt_limited",
      "jnt_actfrclimited", "jnt_actgravcomp",
      "dof_bodyid", "dof_jntid", "dof_parentid", "dof_Madr", "dof_simplenum",
      "geom_type", "geom_contype", "geom_conaffinity", "geom_condim",
      "geom_bodyid", "geom_dataid", "geom_group", "geom_matid",
      "geom_priority",
      "mat_texid", "mat_texrepeat", "mat_texuniform", "mat_rgba",
      "tex_type", "tex_adr", "tex_height", "tex_width", "tex_nchannel",
      "tex_data",
      "site_bodyid", "site_type",
      "cam_mode", "cam_bodyid", "cam_targetbodyid", "cam_fovy",
      "cam_resolution", "cam_sensorsize", "cam_intrinsic",
      "light_mode", "light_bodyid", "light_targetbodyid",
      "light_type", "light_castshadow",
      "mesh_vertadr", "mesh_vertnum", "mesh_faceadr", "mesh_facenum",
      "mesh_vert", "mesh_face",
      "hfield_adr", "hfield_nrow", "hfield_ncol", "hfield_size",
      "pair_dim", "pair_geom1", "pair_geom2", "pair_signature",
      "exclude_signature",
      "eq_type", "eq_obj1id", "eq_obj2id", "eq_objtype", "eq_active0",
      "tendon_adr", "tendon_num", "tendon_limited",
      "wrap_type", "wrap_objid", "wrap_prm",
      "actuator_trntype", "actuator_dyntype", "actuator_gaintype",
      "actuator_biastype", "actuator_trnid", "actuator_actadr",
      "actuator_actnum", "actuator_ctrllimited", "actuator_forcelimited",
      "actuator_actlimited", "actuator_actearly",
      "sensor_type", "sensor_datatype", "sensor_needstage", "sensor_objtype",
      "sensor_objid", "sensor_reftype", "sensor_refid", "sensor_dim",
      "sensor_adr",
      "numeric_adr", "numeric_data", "name_numericadr",
  ]
  for name in static_names:
    fields[name] = i(getattr(m, name))

  float_names = [
      "body_pos", "body_quat", "body_ipos", "body_iquat", "body_mass",
      "body_subtreemass", "body_inertia", "body_gravcomp", "body_invweight0",
      "jnt_solref", "jnt_solimp", "jnt_pos", "jnt_axis", "jnt_stiffness",
      "jnt_range", "jnt_actfrcrange", "jnt_margin",
      "dof_solref", "dof_solimp", "dof_frictionloss", "dof_armature",
      "dof_damping", "dof_invweight0", "dof_M0",
      "geom_solmix", "geom_solref", "geom_solimp", "geom_size", "geom_rbound",
      "geom_pos", "geom_quat", "geom_friction", "geom_margin", "geom_gap",
      "geom_fluid", "geom_rgba",
      "site_size", "site_pos", "site_quat",
      "cam_pos", "cam_quat", "cam_poscom0", "cam_pos0", "cam_mat0",
      "light_pos", "light_dir", "light_poscom0", "light_pos0", "light_dir0",
      "light_diffuse", "light_ambient", "light_specular",
      "light_attenuation", "light_cutoff", "light_exponent",
      "hfield_data",
      "pair_solref", "pair_solreffriction", "pair_solimp", "pair_margin",
      "pair_gap", "pair_friction",
      "eq_solref", "eq_solimp", "eq_data",
      "tendon_solref_lim", "tendon_solimp_lim", "tendon_solref_fri",
      "tendon_solimp_fri", "tendon_range", "tendon_margin",
      "tendon_stiffness", "tendon_damping", "tendon_frictionloss",
      "tendon_lengthspring", "tendon_length0", "tendon_invweight0",
      "actuator_dynprm", "actuator_gainprm", "actuator_biasprm",
      "actuator_ctrlrange", "actuator_forcerange", "actuator_actrange",
      "actuator_gear", "actuator_cranklength", "actuator_acc0",
      "actuator_lengthrange",
      "sensor_cutoff",
  ]
  for name in float_names:
    fields[name] = f(getattr(m, name))

  # version-dependent fields
  fields["light_active"] = i(
      getattr(m, "light_active", np.ones(m.nlight, bool))
  )
  fields["tendon_armature"] = f(
      getattr(m, "tendon_armature", np.zeros(m.ntendon))
  )
  fields["sensor_intprm"] = i(
      getattr(m, "sensor_intprm", np.zeros((m.nsensor, 3), np.int32))
  )
  fields["names"] = m.names

  # host copies used for derived static structure
  fields["geom_size_np"] = np.array(m.geom_size)
  fields["geom_fluid_np"] = np.array(m.geom_fluid)
  fields["geom_rbound_np"] = np.array(m.geom_rbound)
  fields["friction_dofid"] = np.nonzero(m.dof_frictionloss > 0)[0]
  fields["jnt_limit_two_sided"] = (
      np.array(m.jnt_range)[:, 1] - np.array(m.jnt_range)[:, 0]
      < 2 * np.array(m.jnt_margin)
  )
  fields["tendon_limit_two_sided"] = (
      np.array(m.tendon_range)[:, 1] - np.array(m.tendon_range)[:, 0]
      < 2 * np.array(m.tendon_margin)
  ) if m.ntendon else np.zeros(0, bool)
  fields["friction_tenid"] = np.nonzero(m.tendon_frictionloss > 0)[0]
  fields["mesh_convex"] = mesh_mod.get(m)
  fields["has_gravcomp"] = bool(np.any(m.body_gravcomp > 0))
  fields["has_dof_damping"] = bool(np.any(m.dof_damping > 0))
  fields["has_tendon_damping"] = bool(np.any(m.tendon_damping > 0))
  fields["has_tendon_armature"] = bool(
      np.any(getattr(m, "tendon_armature", np.zeros(1)) > 0)
  )
  fields["has_jnt_spring"] = bool(np.any(m.jnt_stiffness > 0))
  fields["has_tendon_spring"] = bool(np.any(m.tendon_stiffness > 0))

  # bake the actuator moment matrix when it is model-constant: every
  # transmission a scalar joint (slide/hinge), where the moment row is just
  # gear[0] at the joint dof (reference device.py:588-629)
  if m.nu:
    trntype = np.array(m.actuator_trntype)
    is_joint = np.isin(
        trntype, (int(TrnType.JOINT), int(TrnType.JOINTINPARENT))
    )
    jid = np.array(m.actuator_trnid)[:, 0]
    # trnid is a joint index only for joint transmissions; clip before the
    # jnt_type gather so BODY/SITE ids (which can exceed njnt) don't fault
    safe_jid = np.where(is_joint, jid, 0)
    scalar = np.isin(
        np.array(m.jnt_type)[safe_jid],
        (int(JointType.SLIDE), int(JointType.HINGE)),
    )
    if np.all(is_joint & scalar):
      sm = np.zeros((m.nu, m.nv))
      sm[np.arange(m.nu), np.array(m.jnt_dofadr)[jid]] = np.array(
          m.actuator_gear
      )[:, 0]
      fields["actuator_static_moment"] = sm

  model = Model(**fields)
  # trigger unsupported-collision / condim checks up front
  from mjtpu._src import collision_driver

  collision_driver.candidate_groups(model)
  return model


# canonical reference name
device_put = put_model


def make_data(m: Model, dtype=None) -> Data:
  """Allocates a fresh Data pytree with statically-known shapes (reference
  io.py:100-221)."""
  dtype = dtype or m.qpos0.dtype
  from mjtpu._src import collision_driver

  ne, nf, nl, ncon, nefc = support.constraint_sizes(m)

  zero = lambda *shape: jnp.zeros(shape, dtype=dtype)
  zero_i = lambda *shape: jnp.zeros(shape, dtype=jnp.int32)

  nbody, njnt, nv, nq = m.nbody, m.njnt, m.nv, m.nq

  xquat = jnp.tile(
      jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype), (nbody, 1)
  )
  eye3 = jnp.tile(jnp.eye(3, dtype=dtype), (nbody, 1, 1))

  # mocap poses default to the model's body frames (mj_makeData semantics)
  mid = np.asarray(m.body_mocapid)
  if m.nmocap:
    mocap_body = np.zeros(m.nmocap, dtype=int)
    mocap_body[mid[mid >= 0]] = np.nonzero(mid >= 0)[0]
    mocap_pos = jnp.asarray(m.body_pos[mocap_body], dtype=dtype)
    mocap_quat = jnp.asarray(m.body_quat[mocap_body], dtype=dtype)
  else:
    mocap_pos = zero(0, 3)
    mocap_quat = jnp.zeros((0, 4), dtype=dtype)

  contact = Contact.zero(ncon, dtype=dtype)
  if ncon:
    contact = contact.replace(
        dim=jnp.asarray(collision_driver.make_condim(m)),
        efc_address=jnp.asarray(collision_driver.contact_efc_address(m, ne, nf, nl)),
    )

  return Data(
      time=zero(),
      qpos=jnp.asarray(m.qpos0, dtype=dtype),
      qvel=zero(nv),
      act=zero(m.na),
      qacc_warmstart=zero(nv),
      ctrl=zero(m.nu),
      qfrc_applied=zero(nv),
      xfrc_applied=zero(nbody, 6),
      eq_active=jnp.asarray(m.eq_active0.astype(bool)),
      mocap_pos=mocap_pos,
      mocap_quat=mocap_quat,
      qacc=zero(nv),
      act_dot=zero(m.na),
      xpos=zero(nbody, 3),
      xquat=xquat,
      xmat=eye3,
      xipos=zero(nbody, 3),
      ximat=eye3,
      xanchor=zero(njnt, 3),
      xaxis=zero(njnt, 3),
      geom_xpos=zero(m.ngeom, 3),
      geom_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (m.ngeom, 1, 1)),
      site_xpos=zero(m.nsite, 3),
      site_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (m.nsite, 1, 1)),
      cam_xpos=zero(m.ncam, 3),
      cam_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (m.ncam, 1, 1)),
      light_xpos=zero(m.nlight, 3),
      light_xdir=zero(m.nlight, 3),
      subtree_com=zero(nbody, 3),
      cdof=zero(nv, 6),
      cinert=zero(nbody, 10),
      ten_length=zero(m.ntendon),
      ten_J=zero(m.ntendon, nv),
      ten_velocity=zero(m.ntendon),
      ten_wrap_xpos=zero(tendon_wrap.n_wrap_geoms(m), 2, 3),
      ten_wrap_active=jnp.zeros(tendon_wrap.n_wrap_geoms(m), dtype=bool),
      actuator_length=zero(m.nu),
      actuator_moment=zero(m.nu, nv),
      actuator_velocity=zero(m.nu),
      actuator_force=zero(m.nu),
      crb=zero(nbody, 10),
      qM=zero(nv, nv),
      qLD=zero(nv, nv),
      qLDiagInv=zero(nv),
      cvel=zero(nbody, 6),
      cdof_dot=zero(nv, 6),
      qfrc_bias=zero(nv),
      qfrc_spring=zero(nv),
      qfrc_damper=zero(nv),
      qfrc_gravcomp=zero(nv),
      qfrc_fluid=zero(nv),
      qfrc_passive=zero(nv),
      subtree_linvel=zero(nbody, 3),
      subtree_angmom=zero(nbody, 3),
      contact=contact,
      efc_J=zero(nefc, nv),
      efc_pos=zero(nefc),
      efc_margin=zero(nefc),
      efc_frictionloss=zero(nefc),
      efc_D=zero(nefc),
      efc_aref=zero(nefc),
      efc_force=zero(nefc),
      qfrc_actuator=zero(nv),
      qfrc_smooth=zero(nv),
      qacc_smooth=zero(nv),
      qfrc_constraint=zero(nv),
      qfrc_inverse=zero(nv),
      cacc=zero(nbody, 6),
      cfrc_int=zero(nbody, 6),
      cfrc_ext=zero(nbody, 6),
      sensordata=zero(m.nsensordata),
      energy=zero(2),
      solver_niter=zero_i(),
      nreset=zero_i(),
  )


def put_data(m: Model, d: mujoco.MjData, dtype=None) -> Data:
  """Copies the *state* of an MjData into a fresh Data pytree (derived
  quantities are filled by running the forward pipeline)."""
  dtype = dtype or m.qpos0.dtype
  out = make_data(m, dtype=dtype)
  f = lambda x: jnp.asarray(np.array(x), dtype=dtype)
  return out.replace(
      time=f(d.time),
      qpos=f(d.qpos),
      qvel=f(d.qvel),
      act=f(d.act),
      qacc_warmstart=f(d.qacc_warmstart),
      ctrl=f(d.ctrl),
      qfrc_applied=f(d.qfrc_applied),
      xfrc_applied=f(d.xfrc_applied),
      eq_active=jnp.asarray(np.array(d.eq_active, dtype=bool)),
      mocap_pos=f(d.mocap_pos).reshape(m.nmocap, 3),
      mocap_quat=f(d.mocap_quat).reshape(m.nmocap, 4),
  )


def get_data_into(result, m: Model, d: Data, sort_contacts: bool = False) -> None:
  """Writes a Data back into an MjData (reference device_get_into,
  device.py:1119-1206).  State + kinematics + dynamics outputs; contacts
  are written up to mjData's capacity.  A batched Data writes into a
  list of MjData of matching length (reference's list-of-N path).

  sort_contacts: emit contacts in canonical (geom1, geom2) order instead
  of the engine's collider-group order.  The group order can differ from
  C's collision-function order on the same scene (documented at
  sensor.py's contact-sensor match note), so the canonical sort makes
  mjData-level C diffing deterministic."""
  batched = d.qpos.ndim > 1
  if batched:
    if not isinstance(result, (list, tuple)):
      raise ValueError(
          "batched Data requires a list of MjData of length "
          f"{d.qpos.shape[0]}"
      )
    if len(result) != d.qpos.shape[0]:
      raise ValueError(
          f"need {d.qpos.shape[0]} MjData instances, got {len(result)}"
      )
    for i, res in enumerate(result):
      get_data_into(res, m, jax.tree.map(lambda x: x[i], d), sort_contacts)
    return

  for name in (
      "time", "qpos", "qvel", "act", "qacc_warmstart", "ctrl",
      "qfrc_applied", "xfrc_applied", "qacc", "act_dot", "xpos", "xquat",
      "xipos", "xanchor", "xaxis", "geom_xpos", "site_xpos", "cam_xpos",
      "subtree_com", "cdof", "cinert", "ten_length", "ten_velocity",
      "actuator_length", "actuator_velocity", "actuator_force", "crb",
      "qLDiagInv", "cvel", "cdof_dot", "qfrc_bias", "qfrc_passive",
      "subtree_linvel", "subtree_angmom", "qfrc_actuator", "qfrc_smooth",
      "qacc_smooth", "qfrc_constraint", "qfrc_inverse", "cacc", "cfrc_int",
      "cfrc_ext", "sensordata", "energy", "mocap_pos", "mocap_quat",
  ):
    val = np.asarray(getattr(d, name), dtype=np.float64)
    target = getattr(result, name)
    if not hasattr(target, "shape"):  # python scalars (time)
      setattr(result, name, float(val))
    elif target.shape == val.shape:
      target[...] = val
  # matrix-shaped fields stored flat in mjData
  result.xmat[...] = np.asarray(d.xmat).reshape(result.xmat.shape)
  result.ximat[...] = np.asarray(d.ximat).reshape(result.ximat.shape)
  result.geom_xmat[...] = np.asarray(d.geom_xmat).reshape(result.geom_xmat.shape)
  result.site_xmat[...] = np.asarray(d.site_xmat).reshape(result.site_xmat.shape)
  if result.qM.shape == np.asarray(d.qM).shape:
    result.qM[...] = np.asarray(d.qM)

  # solver diagnostics (C keeps per-island stats; we report island 0)
  if hasattr(result, "solver_niter") and result.solver_niter.size:
    result.solver_niter[0] = int(np.asarray(d.solver_niter))

  # contacts + efc rows: compact the static-layout rows down to C's
  # dynamic layout — d->contact keeps every detected contact (dist <
  # margin+gap; gap-band rows get exclude=1), efc keeps only live rows,
  # reallocating mjData's arena (reference device_get_into,
  # device.py:1119-1206, where torch rows are already dynamic)
  ne_s, nf_s, nl_s, ncon_s, nefc_s = support.constraint_sizes(m)
  nc_start = ne_s + nf_s + nl_s
  dist = np.asarray(d.contact.dist)
  im = np.asarray(d.contact.includemargin)
  addr = np.asarray(d.contact.efc_address)
  dim = np.asarray(d.contact.dim)
  geom1 = np.asarray(d.contact.geom1)
  geom2 = np.asarray(d.contact.geom2)
  active = np.nonzero(dist < np.asarray(d.contact.margin))[0]
  if sort_contacts and active.size:
    active = active[np.lexsort((dist[active], geom2[active], geom1[active]))]

  # live efc rows: non-contact rows with a nonzero J row (equality rows
  # zero themselves when eq_active is off, limit rows when not violated;
  # friction rows are always live), contact rows when dist < includemargin
  efc_J = np.asarray(d.efc_J, dtype=np.float64)
  live = np.zeros(nefc_s, bool)
  if nefc_s:
    live[:nc_start] = np.abs(efc_J[:nc_start]).max(axis=1) > 0
    # C keeps every row of an active equality even when a J row is
    # identically zero (e.g. a connect axis no dof can move), so gate the
    # eq block on eq_active rather than J
    if ne_s:
      live[:ne_s] = np.repeat(
          np.asarray(d.eq_active, bool),
          [support._EQ_ROWS[int(t)] for t in m.eq_type],
      )
    live[ne_s : ne_s + nf_s] = True
  pyramidal = m.opt.cone == ConeType.PYRAMIDAL
  rows_of = lambda dm: 1 if dm == 1 else (2 * (dm - 1) if pyramidal else dm)
  for i in range(len(dist)):
    if dist[i] < im[i]:
      live[addr[i] : addr[i] + rows_of(int(dim[i]))] = True
  new_index = np.cumsum(live) - 1  # static row -> compacted row
  nefc_live = int(live.sum())

  try:
    mujoco._functions._realloc_con_efc(
        result, ncon=len(active), nefc=nefc_live, nJ=nefc_live * m.nv
    )
  except Exception as e:  # pylint: disable=broad-except
    warnings.warn(f"get_data_into: contact/efc realloc failed: {e!r}")
    return

  try:
    # vectorized write-back: mjData.contact exposes (ncon, ...) array views,
    # so the whole active set lands in a handful of fancy-indexed assigns
    # (the per-contact python loop was quadratic pain at huge ncon)
    if active.size:
      c = result.contact
      c.exclude[:] = (dist[active] >= im[active]).astype(np.int32)
      c.dist[:] = dist[active]
      c.pos[:] = np.asarray(d.contact.pos)[active]
      c.frame[:] = np.asarray(d.contact.frame)[active].reshape(active.size, -1)
      c.includemargin[:] = im[active]
      c.friction[:] = np.asarray(d.contact.friction)[active]
      c.solref[:] = np.asarray(d.contact.solref)[active]
      c.solimp[:] = np.asarray(d.contact.solimp)[active]
      c.dim[:] = dim[active]
      c.geom1[:] = geom1[active]
      c.geom2[:] = geom2[active]
      c.geom[:] = np.asarray(d.contact.geom)[active]
      # point at the row's position in the compacted efc arrays;
      # gap-band contacts contribute no rows (C uses -1 there)
      c.efc_address[:] = np.where(
          dist[active] < im[active], new_index[addr[active]], -1
      )
  except Exception as e:  # pylint: disable=broad-except
    warnings.warn(f"get_data_into: contact write-back failed: {e!r}")

  if not nefc_live:
    return
  try:
    efc_type, efc_id = support.efc_row_meta(m)
    # contact rows' efc_id indexes d->contact, which was just compacted
    con_rows = efc_type >= int(mujoco.mjtConstraint.mjCNSTR_CONTACT_FRICTIONLESS)
    id_remap = np.full(len(dist), -1, np.int32)
    id_remap[active] = np.arange(len(active), dtype=np.int32)
    efc_id = efc_id.copy()
    efc_id[con_rows] = id_remap[efc_id[con_rows]]
    result.ne = int(live[:ne_s].sum())
    result.nf = int(live[ne_s : ne_s + nf_s].sum())
    result.nl = int(live[nc_start - nl_s : nc_start].sum())
    result.efc_type[:] = efc_type[live]
    result.efc_id[:] = efc_id[live]
    for name in (
        "efc_pos", "efc_margin", "efc_frictionloss", "efc_D", "efc_aref",
        "efc_force",
    ):
      getattr(result, name)[:] = np.asarray(getattr(d, name), np.float64)[live]
    # dense rows in mjData's sparse storage
    result.efc_J[:] = efc_J[live].reshape(-1)
    result.efc_J_rownnz[:] = m.nv
    result.efc_J_rowadr[:] = np.arange(nefc_live) * m.nv
    result.efc_J_colind[:] = np.tile(np.arange(m.nv), nefc_live)
  except Exception as e:  # pylint: disable=broad-except
    warnings.warn(f"get_data_into: efc write-back failed: {e!r}")


device_get_into = get_data_into


def save_checkpoint(path: str, d: Data) -> None:
  """Saves a Data pytree (single or batched) to an .npz checkpoint.

  Data is a pure array pytree, so engine-level checkpoint/resume is plain
  serialization (SURVEY.md §5 — the reference used torch.save the same way).
  For multi-host sharded training state prefer orbax-checkpoint."""
  leaves, treedef = jax.tree.flatten(d)
  np.savez(path, *[np.asarray(x) for x in leaves])


def load_checkpoint(path: str, like: Data) -> Data:
  """Loads a Data checkpoint saved by save_checkpoint ('like' provides the
  pytree structure, e.g. make_data(m) or a batched template)."""
  leaves, treedef = jax.tree.flatten(like)
  with np.load(path) as z:
    new_leaves = [
        jnp.asarray(z[f"arr_{i}"], dtype=leaves[i].dtype)
        for i in range(len(leaves))
    ]
  return jax.tree.unflatten(treedef, new_leaves)


def procedural_terrain(mjm: mujoco.MjModel, seed: int = 0) -> None:
  """Fills every hfield in a host MjModel with deterministic sinusoidal
  bumps, flat near the origin so models spawn on level ground.

  MJCF cannot inline elevation data, so terrain assets ship flat and are
  filled here before put_model (used by bench.py and the humanoid_terrain
  zoo env).  The seed is reserved for future randomized variants; the
  default surface is fully deterministic."""
  del seed
  for h in range(mjm.nhfield):
    nrow, ncol = int(mjm.hfield_nrow[h]), int(mjm.hfield_ncol[h])
    adr = int(mjm.hfield_adr[h])
    rx, ry = mjm.hfield_size[h, 0], mjm.hfield_size[h, 1]
    x = np.linspace(-rx, rx, ncol)[None, :]
    y = np.linspace(-ry, ry, nrow)[:, None]
    bumps = 0.5 * (1.0 + np.sin(1.7 * x) * np.sin(1.3 * y))
    r = np.sqrt(x * x + y * y)
    ramp = np.clip((r - 2.0) / 3.0, 0.0, 1.0)
    mjm.hfield_data[adr : adr + nrow * ncol] = (bumps * ramp).reshape(-1)
