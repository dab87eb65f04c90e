"""Inverse dynamics.

Reference capability map: mujoco_torch/_src/inverse.py (inverse :24-103 —
position+velocity stages, discrete-acc undo, constraint force from the
active-set formula, qfrc_inverse assembly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src import collision_driver, constraint, forward, math, sensor, smooth, solver, support
from mjtpu._src.types import Data, DisableBit, EnableBit, IntegratorType, Model
from mjtpu._src.precision import matmul_precision


def _inv_constraint(m: Model, d: Data) -> Data:
  """Constraint force from qacc via the dual active-set formula
  (mj_invConstraint): force = D * (aref - J qacc) with row-type zones."""
  ne, nf, nl, nefc = support.count_constraints(m)
  if nefc == 0:
    return d.replace(
        qfrc_constraint=jnp.zeros(m.nv, dtype=d.qpos.dtype),
        efc_force=jnp.zeros(0, dtype=d.qpos.dtype),
    )
  meta = solver._efc_meta(m)
  jaref = d.efc_J @ d.qacc - d.efc_aref
  mu_rows = solver._mu_rows(meta, d.contact.friction, d.qpos.dtype)
  force, _, _ = solver._row_costs(
      m, meta, jaref, d.efc_D, d.efc_frictionloss, mu_rows
  )
  return d.replace(
      efc_force=force, qfrc_constraint=d.efc_J.T @ force
  )


def discrete_acc(m: Model, d: Data) -> jax.Array:
  """Undo the integrator discretization of qacc (mj_invDiscrete semantics)
  so continuous-time inverse dynamics apply (reference inverse.py)."""
  qacc = d.qacc
  if m.opt.integrator == IntegratorType.RK4:
    raise NotImplementedError("discrete inverse with RK4")
  if m.opt.integrator == IntegratorType.EULER:
    if m.has_dof_damping and not (m.opt.disableflags & DisableBit.EULERDAMP):
      # qacc solves (M + h diag(B)) qacc = qfrc; recover M qacc = qfrc - h B qacc
      qfrc = d.qM @ qacc + m.opt.timestep * m.dof_damping * qacc
      qacc = smooth.solve_m(m, d, qfrc)
  elif m.opt.integrator in (
      IntegratorType.IMPLICITFAST, IntegratorType.IMPLICIT
  ):
    from mjtpu._src import derivative

    # oracle-probed: C's mj_invDiscrete applies the same smooth-vel
    # derivative (no RNE term) for Implicit as for ImplicitFast — at a
    # fixed state both produce identical qfrc_inverse to 1e-8
    qderiv = derivative.deriv_smooth_vel(m, d)
    qfrc = d.qM @ qacc - m.opt.timestep * (qderiv @ qacc)
    qacc = smooth.solve_m(m, d, qfrc)
  return qacc


@matmul_precision
def inverse(m: Model, d: Data) -> Data:
  """Inverse dynamics (mj_inverse): given (qpos, qvel, qacc), computes
  qfrc_inverse = the applied generalized force that would produce qacc."""
  d = forward.fwd_position(m, d)
  d = sensor.sensor_pos(m, d)
  d = forward.fwd_velocity(m, d)
  d = sensor.sensor_vel(m, d)

  qacc_in = d.qacc
  if m.opt.enableflags & EnableBit.INVDISCRETE:
    # constraint force, acc sensors and qfrc_inverse all see the
    # continuous-time qacc; the caller's qacc is restored on return
    # (mj_inverse saves/restores d->qacc around the conversion)
    d = d.replace(qacc=discrete_acc(m, d))

  d = _inv_constraint(m, d)
  d = sensor.sensor_acc(m, d)

  qfrc_inverse = (
      d.qfrc_bias
      + d.qM @ d.qacc
      - d.qfrc_passive
      - d.qfrc_constraint
  )
  return d.replace(qfrc_inverse=qfrc_inverse, qacc=qacc_in)
