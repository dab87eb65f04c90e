"""Forward dynamics orchestration + integrators.

Reference capability map: mujoco_torch/_src/forward.py (stage order
forward.py:73-228, integrators :255-416, step :463-496).  Stage order and
physics math match mj_forward/mj_step; everything is a pure function over
(Model, Data) so batching is jax.vmap and fusion is jit — none of the
reference's clone/alias/recompile management exists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src import (
    collision_driver,
    constraint,
    math,
    passive as passive_mod,
    scan,
    sensor as sensor_mod,
    smooth,
    solver,
    support,
)
from mjtpu._src.precision import matmul_precision
from mjtpu._src.types import (
    BiasType,
    Data,
    DisableBit,
    EnableBit,
    DynType,
    GainType,
    IntegratorType,
    JointType,
    MAXVAL,
    Model,
)


def _check_state(m: Model, d: Data) -> Data:
  """Resets non-finite / diverged state (mj_checkPos/Vel semantics,
  reference forward.py:44-59)."""
  bad = lambda x: jnp.any(~jnp.isfinite(x)) | jnp.any(jnp.abs(x) > MAXVAL)
  reset = bad(d.qpos) | bad(d.qvel)
  qpos = jnp.where(reset, jnp.asarray(m.qpos0, dtype=d.qpos.dtype), d.qpos)
  qvel = jnp.where(reset, jnp.zeros_like(d.qvel), d.qvel)
  qacc = jnp.where(reset, jnp.zeros_like(d.qacc), d.qacc)
  warm = jnp.where(reset, jnp.zeros_like(d.qacc_warmstart), d.qacc_warmstart)
  nreset = d.nreset + reset.astype(d.nreset.dtype)
  return d.replace(
      qpos=qpos, qvel=qvel, qacc=qacc, qacc_warmstart=warm, nreset=nreset
  )


@matmul_precision
def fwd_position(m: Model, d: Data) -> Data:
  """Position-dependent computations (mj_fwdPosition)."""
  d = smooth.kinematics(m, d)
  d = smooth.com_pos(m, d)
  d = smooth.camlight(m, d)
  d = smooth.tendon(m, d)
  d = smooth.crb(m, d)
  if m.has_tendon_armature:
    d = smooth.tendon_armature(m, d)
  d = smooth.factor_m(m, d)
  d = collision_driver.collision(m, d)
  d = constraint.make_constraint(m, d)
  d = smooth.transmission(m, d)
  if m.opt.enableflags & EnableBit.ENERGY:
    d = smooth.energy_pos(m, d)
  return d


_position = fwd_position


@matmul_precision
def fwd_velocity(m: Model, d: Data) -> Data:
  """Velocity-dependent computations (mj_fwdVelocity)."""
  actuator_velocity = d.actuator_moment @ d.qvel
  ten_velocity = d.ten_J @ d.qvel if m.ntendon else d.ten_velocity
  d = d.replace(actuator_velocity=actuator_velocity, ten_velocity=ten_velocity)
  d = smooth.com_vel(m, d)
  d = passive_mod.passive(m, d)
  d = smooth.rne(m, d)
  if m.opt.enableflags & EnableBit.ENERGY:
    d = smooth.energy_vel(m, d)
  return d


_velocity = fwd_velocity


@matmul_precision
def fwd_actuation(m: Model, d: Data) -> Data:
  """Actuator forces and activation derivatives (mj_fwdActuation)."""
  dtype = d.qpos.dtype
  if not m.nu or (m.opt.disableflags & DisableBit.ACTUATION):
    qfrc = jnp.zeros(m.nv, dtype=dtype)
    if m.has_gravcomp:
      actgrav_dof = np.asarray(m.jnt_actgravcomp)[np.asarray(m.dof_jntid)]
      qfrc = qfrc + jnp.where(jnp.asarray(actgrav_dof == 1), d.qfrc_gravcomp, 0.0)
    return d.replace(
        act_dot=jnp.zeros(m.na, dtype=dtype),
        actuator_force=jnp.zeros(m.nu, dtype=dtype),
        qfrc_actuator=qfrc,
    )

  # --- control clamping ---
  ctrl = d.ctrl
  if not (m.opt.disableflags & DisableBit.CLAMPCTRL):
    limited = np.asarray(m.actuator_ctrllimited, dtype=bool)
    clamped = jnp.clip(ctrl, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1])
    ctrl = jnp.where(jnp.asarray(limited), clamped, ctrl)

  # --- activation dynamics (per static dyntype group) ---
  act_dot = jnp.zeros(m.na, dtype=dtype)
  dyntype = np.asarray(m.actuator_dyntype)
  actadr = np.asarray(m.actuator_actadr)
  actnum = np.asarray(m.actuator_actnum)
  act_last_idx = actadr + actnum - 1  # per-actuator last activation slot

  for dt_ in (DynType.INTEGRATOR, DynType.FILTER, DynType.FILTEREXACT, DynType.MUSCLE):
    ids = np.nonzero(dyntype == dt_)[0]
    if not len(ids):
      continue
    slots = act_last_idx[ids]
    if dt_ == DynType.INTEGRATOR:
      val = ctrl[ids]
    elif dt_ in (DynType.FILTER, DynType.FILTEREXACT):
      tau = jnp.maximum(math.MINVAL, m.actuator_dynprm[ids, 0])
      val = (ctrl[ids] - d.act[slots]) / tau
    else:  # MUSCLE
      val = jax.vmap(support.muscle_dynamics)(
          ctrl[ids], d.act[slots], m.actuator_dynprm[ids]
      )
    act_dot = act_dot.at[slots].set(val)

  # --- actuator input (ctrl or activation state) ---
  stateful = actadr >= 0
  if m.na:
    act_in = d.act[np.maximum(act_last_idx, 0)]
    early = np.asarray(m.actuator_actearly, dtype=bool) & stateful
    if early.any():
      act_in = jnp.where(
          jnp.asarray(early),
          act_in + m.opt.timestep * act_dot[np.maximum(act_last_idx, 0)],
          act_in,
      )
    ainput = jnp.where(jnp.asarray(stateful), act_in, ctrl)
  else:
    ainput = ctrl

  # --- gain / bias (per static type group) ---
  gain = jnp.zeros(m.nu, dtype=dtype)
  gaintype = np.asarray(m.actuator_gaintype)
  ids = np.nonzero(gaintype == GainType.FIXED)[0]
  if len(ids):
    gain = gain.at[ids].set(m.actuator_gainprm[ids, 0])
  ids = np.nonzero(gaintype == GainType.AFFINE)[0]
  if len(ids):
    gain = gain.at[ids].set(
        m.actuator_gainprm[ids, 0]
        + m.actuator_gainprm[ids, 1] * d.actuator_length[ids]
        + m.actuator_gainprm[ids, 2] * d.actuator_velocity[ids]
    )
  ids = np.nonzero(gaintype == GainType.MUSCLE)[0]
  if len(ids):
    gain = gain.at[ids].set(
        jax.vmap(support.muscle_gain)(
            d.actuator_length[ids],
            d.actuator_velocity[ids],
            m.actuator_lengthrange[ids],
            m.actuator_acc0[ids],
            m.actuator_gainprm[ids],
        )
    )

  bias = jnp.zeros(m.nu, dtype=dtype)
  biastype = np.asarray(m.actuator_biastype)
  ids = np.nonzero(biastype == BiasType.AFFINE)[0]
  if len(ids):
    bias = bias.at[ids].set(
        m.actuator_biasprm[ids, 0]
        + m.actuator_biasprm[ids, 1] * d.actuator_length[ids]
        + m.actuator_biasprm[ids, 2] * d.actuator_velocity[ids]
    )
  ids = np.nonzero(biastype == BiasType.MUSCLE)[0]
  if len(ids):
    bias = bias.at[ids].set(
        jax.vmap(support.muscle_bias)(
            d.actuator_length[ids],
            m.actuator_lengthrange[ids],
            m.actuator_acc0[ids],
            m.actuator_biasprm[ids],
        )
    )

  force = gain * ainput + bias

  forcelimited = np.asarray(m.actuator_forcelimited, dtype=bool)
  if forcelimited.any():
    clamped = jnp.clip(
        force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1]
    )
    force = jnp.where(jnp.asarray(forcelimited), clamped, force)

  qfrc_actuator = d.actuator_moment.T @ force

  # actuator-channel gravity compensation (jnt_actgravcomp)
  if m.has_gravcomp:
    actgrav_dof = np.asarray(m.jnt_actgravcomp)[np.asarray(m.dof_jntid)]
    qfrc_actuator = qfrc_actuator + jnp.where(
        jnp.asarray(actgrav_dof == 1), d.qfrc_gravcomp, 0.0
    )

  # clamp per-dof actuator force (jnt_actfrcrange)
  actfrclimited = np.asarray(m.jnt_actfrclimited, dtype=bool)[
      np.asarray(m.dof_jntid)
  ]
  if actfrclimited.any():
    rng = m.jnt_actfrcrange[np.asarray(m.dof_jntid)]
    clamped = jnp.clip(qfrc_actuator, rng[:, 0], rng[:, 1])
    qfrc_actuator = jnp.where(jnp.asarray(actfrclimited), clamped, qfrc_actuator)

  return d.replace(act_dot=act_dot, actuator_force=force, qfrc_actuator=qfrc_actuator)


_actuation = fwd_actuation


@matmul_precision
def fwd_acceleration(m: Model, d: Data) -> Data:
  """Smooth (unconstrained) acceleration (mj_fwdAcceleration)."""
  qfrc_applied = d.qfrc_applied + support.xfrc_accumulate(m, d)
  qfrc_smooth = d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator + qfrc_applied
  qacc_smooth = smooth.solve_m(m, d, qfrc_smooth)
  return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)


_acceleration = fwd_acceleration


@matmul_precision
def forward(m: Model, d: Data, fixed_iterations: bool = False) -> Data:
  """Full forward dynamics (mj_forward)."""
  d = fwd_position(m, d)
  d = sensor_mod.sensor_pos(m, d)
  d = fwd_velocity(m, d)
  d = sensor_mod.sensor_vel(m, d)
  d = fwd_actuation(m, d)
  d = fwd_acceleration(m, d)

  _, _, _, nefc = support.count_constraints(m)
  if nefc == 0:
    d = d.replace(qacc=d.qacc_smooth, qacc_warmstart=d.qacc_smooth)
  else:
    d = solver.solve(m, d, fixed_iterations=fixed_iterations)

  d = sensor_mod.sensor_acc(m, d)
  return d


def _advance(
    m: Model,
    d: Data,
    act_dot: jax.Array,
    qacc: jax.Array,
    qvel: jax.Array | None = None,
) -> Data:
  """Integrates state with the semi-implicit update (mj_advance semantics,
  reference forward.py:255-310)."""
  h = m.opt.timestep

  # --- activation integration ---
  act = d.act
  if m.na:
    act = act + act_dot * h
    # exact filter update overrides the linear one
    dyntype = np.asarray(m.actuator_dyntype)
    actadr = np.asarray(m.actuator_actadr)
    actnum = np.asarray(m.actuator_actnum)
    ids = np.nonzero(dyntype == DynType.FILTEREXACT)[0]
    if len(ids):
      slots = (actadr + actnum - 1)[ids]
      tau = jnp.maximum(math.MINVAL, m.actuator_dynprm[ids, 0])
      act = act.at[slots].set(
          d.act[slots] + act_dot[slots] * tau * (1.0 - jnp.exp(-h / tau))
      )
    # clamp activations (static slot indexing, traced range values)
    actlimited = np.asarray(m.actuator_actlimited, dtype=bool)
    if actlimited.any():
      per_act_limited = np.zeros(m.na, dtype=bool)
      lo = jnp.zeros(m.na, dtype=act.dtype)
      hi = jnp.zeros(m.na, dtype=act.dtype)
      for u in np.nonzero(actlimited)[0]:
        sl = np.arange(actadr[u], actadr[u] + actnum[u])
        per_act_limited[sl] = True
        lo = lo.at[sl].set(m.actuator_actrange[u, 0])
        hi = hi.at[sl].set(m.actuator_actrange[u, 1])
      act = jnp.where(
          jnp.asarray(per_act_limited), jnp.clip(act, lo, hi), act
      )

  # --- velocity (state update always uses qacc; the optional qvel argument
  # only overrides the velocity used for position integration — RK4) ---
  qvel_state = d.qvel + qacc * h
  qvel_new = qvel_state if qvel is None else qvel

  # --- position (quaternion-correct) ---
  def fn(jnt_types, qpos, qvel_b):
    out = []
    qi = vi = 0
    for jt in jnt_types:
      jt = JointType(jt)
      if jt == JointType.FREE:
        out.append(qpos[qi : qi + 3] + h * qvel_b[vi : vi + 3])
        out.append(
            math.quat_integrate(qpos[qi + 3 : qi + 7], qvel_b[vi + 3 : vi + 6], h)
        )
        qi, vi = qi + 7, vi + 6
      elif jt == JointType.BALL:
        out.append(math.quat_integrate(qpos[qi : qi + 4], qvel_b[vi : vi + 3], h))
        qi, vi = qi + 4, vi + 3
      else:
        out.append((qpos[qi] + h * qvel_b[vi]).reshape(1))
        qi, vi = qi + 1, vi + 1
    if not out:
      return jnp.zeros(0, dtype=qpos.dtype)
    return jnp.concatenate(out)

  qpos = scan.flat(m, fn, "jqv", "q", np.asarray(m.jnt_type), d.qpos, qvel_new)
  if qpos is None:
    qpos = d.qpos

  return d.replace(
      act=act, qpos=qpos, qvel=qvel_state, qacc=qacc, time=d.time + h
  )


@matmul_precision
def euler(m: Model, d: Data) -> Data:
  """Semi-implicit Euler with optional implicit joint damping (mj_Euler)."""
  qacc = d.qacc
  # implicit damping correction is skipped when either EULERDAMP or the
  # damping forces themselves (DAMPER) are disabled — matching mj_Euler
  if (
      m.has_dof_damping
      and not (m.opt.disableflags & DisableBit.EULERDAMP)
      and not (m.opt.disableflags & DisableBit.DAMPER)
  ):
    mh = d.qM + m.opt.timestep * jnp.diag(m.dof_damping)
    qfrc = d.qfrc_smooth + d.qfrc_constraint
    qacc = smooth.factor_solve(m, mh, qfrc)
  return _advance(m, d, d.act_dot, qacc)


@matmul_precision
def rungekutta4(m: Model, d: Data) -> Data:
  """4th-order Runge-Kutta (mj_RungeKutta, reference forward.py:331-370).

  The three extra stages run under one ``lax.scan`` with the tableau
  coefficient as the scanned input: the stage bodies are identical, so the
  full forward pipeline is traced/compiled once here instead of three
  times (the reference — and a naive unroll — retraces forward per stage,
  which cost ~115 s of XLA compile on walker2d at B=131072; the scan form
  compiles in roughly half)."""
  A = (0.5, 0.5, 1.0)
  B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)
  h = m.opt.timestep

  qpos0, qvel0, act0, time0 = d.qpos, d.qvel, d.act, d.time

  def stage(carry, a):
    dd, qvel_prev, qacc_prev, act_dot_prev = carry
    # X_i = X_0 + (h a) * F_{i-1}
    qvel_i = qvel0 + (h * a) * qacc_prev
    act_i = act0 + (h * a) * act_dot_prev
    dd = _integrate_pos_only(m, dd, qpos0, qvel_prev, h * a)
    dd = dd.replace(qvel=qvel_i, act=act_i, time=time0 + h * a)
    dd = forward(m, dd)
    return (dd, dd.qvel, dd.qacc, dd.act_dot), (dd.qvel, dd.qacc, dd.act_dot)

  (dd, _, _, _), (qvels_s, qaccs_s, act_dots_s) = jax.lax.scan(
      stage, (d, d.qvel, d.qacc, d.act_dot), jnp.asarray(A, d.qpos.dtype)
  )

  # same left-to-right combination order as the unrolled form
  qvels = [qvel0, qvels_s[0], qvels_s[1], qvels_s[2]]
  qaccs = [d.qacc, qaccs_s[0], qaccs_s[1], qaccs_s[2]]
  act_dots = [d.act_dot, act_dots_s[0], act_dots_s[1], act_dots_s[2]]
  qvel_comb = sum(b * v for b, v in zip(B, qvels))
  qacc_comb = sum(b * v for b, v in zip(B, qaccs))
  act_dot_comb = sum(b * v for b, v in zip(B, act_dots))

  # restore X0 state (keep the last stage's derived fields, like mj), then
  # advance: qvel += h*qacc_comb, qpos integrated with qvel_comb
  dd = dd.replace(qpos=qpos0, qvel=qvel0, act=act0, time=time0)
  return _advance(m, dd, act_dot_comb, qacc_comb, qvel=qvel_comb)


def _integrate_pos_only(m: Model, d: Data, qpos0, qvel, dt) -> Data:
  """qpos_out = integrate(qpos0, qvel, dt) (mj_integratePos)."""

  def fn(jnt_types, qpos, qvel_b):
    out = []
    qi = vi = 0
    for jt in jnt_types:
      jt = JointType(jt)
      if jt == JointType.FREE:
        out.append(qpos[qi : qi + 3] + dt * qvel_b[vi : vi + 3])
        out.append(
            math.quat_integrate(qpos[qi + 3 : qi + 7], qvel_b[vi + 3 : vi + 6], dt)
        )
        qi, vi = qi + 7, vi + 6
      elif jt == JointType.BALL:
        out.append(math.quat_integrate(qpos[qi : qi + 4], qvel_b[vi : vi + 3], dt))
        qi, vi = qi + 4, vi + 3
      else:
        out.append((qpos[qi] + dt * qvel_b[vi]).reshape(1))
        qi, vi = qi + 1, vi + 1
    if not out:
      return jnp.zeros(0, dtype=qpos.dtype)
    return jnp.concatenate(out)

  qpos = scan.flat(m, fn, "jqv", "q", np.asarray(m.jnt_type), qpos0, qvel)
  if qpos is None:
    qpos = qpos0
  return d.replace(qpos=qpos)


@matmul_precision
def implicit(m: Model, d: Data) -> Data:
  """Implicit-in-velocity integrators (mj_implicit: Implicit/ImplicitFast).

  ImplicitFast drops the RNE (Coriolis) velocity derivative; the full
  Implicit integrator includes it (capability-plus vs the reference)."""
  from mjtpu._src import derivative

  full = m.opt.integrator == IntegratorType.IMPLICIT
  qderiv = derivative.deriv_smooth_vel(m, d, rne=full)
  if not full:
    # C's ImplicitFast symmetrizes qDeriv and Cholesky-factors (mjData.qH);
    # only fluid drag makes it asymmetric, but the symmetrized update is
    # what C integrates (oracle-verified: raw-LU drifts vs C with fluid)
    qderiv = 0.5 * (qderiv + qderiv.T)
  mh = d.qM - m.opt.timestep * qderiv
  qfrc = d.qfrc_smooth + d.qfrc_constraint
  qacc = smooth.factor_solve(m, mh, qfrc, symmetric=False)
  return _advance(m, d, d.act_dot, qacc)


def _single_step(m: Model, d: Data, fixed_iterations: bool) -> Data:
  d = _check_state(m, d)
  d = forward(m, d, fixed_iterations=fixed_iterations)

  if m.opt.integrator == IntegratorType.EULER:
    return euler(m, d)
  if m.opt.integrator == IntegratorType.RK4:
    return rungekutta4(m, d)
  if m.opt.integrator in (IntegratorType.IMPLICITFAST, IntegratorType.IMPLICIT):
    return implicit(m, d)
  raise NotImplementedError(m.opt.integrator)


@matmul_precision
def step(m: Model, d: Data, fixed_iterations: bool = False) -> Data:
  """Advances the simulation one timestep (mj_step).

  Inside ``differentiable_mode()`` the solver runs a fixed iteration count
  (reverse-differentiable) and, when ``adaptive_integration`` is set, the
  step splits into N equal substeps (reference forward.py:419-460)."""
  from mjtpu._src.diff_config import get_diff_config

  cfg = get_diff_config()
  if cfg is not None:
    fixed_iterations = True  # lax.while_loop has no transpose rule
    if cfg.adaptive_integration and cfg.adaptive_substeps > 1:
      n = cfg.adaptive_substeps
      m_sub = m.tree_replace({"opt.timestep": m.opt.timestep / n})
      for _ in range(n):
        d = _single_step(m_sub, d, fixed_iterations)
      return d
  return _single_step(m, d, fixed_iterations)
