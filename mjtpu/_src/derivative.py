"""Smooth-dynamics derivatives for implicit integration.

Reference capability map: mujoco_torch/_src/derivative.py
(deriv_smooth_vel: d(qfrc_actuator + qfrc_passive)/dqvel for ImplicitFast).
Capability-plus: `rne=True` adds the RNE (Coriolis/centrifugal) velocity
derivative for the full Implicit integrator (C mjd_smooth_vel) — computed
with jacfwd over the com_vel+rne pipeline instead of C's hand-derived
spatial-algebra recursion, which is exact and keeps the code one closure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src.types import BiasType, Data, DisableBit, DynType, GainType, Model


def deriv_smooth_vel(m: Model, d: Data, rne: bool = False) -> jax.Array:
  """(nv, nv) derivative of smooth forces w.r.t. qvel (mjd_smooth_vel).

  Covers: affine actuator gain/bias velocity terms, joint damping, tendon
  damping, fluid drag (inertia-box model; the reference rejects fluid with
  implicit integration, derivative.py:22-68), and (rne=True, the full
  Implicit integrator) the RNE bias-force velocity derivative."""
  dtype = d.qpos.dtype
  qderiv = jnp.zeros((m.nv, m.nv), dtype=dtype)

  # actuation: moment^T @ diag(dforce/dvel) @ moment
  if m.nu and not (m.opt.disableflags & DisableBit.ACTUATION):
    dgain = jnp.zeros(m.nu, dtype=dtype)
    ids = np.nonzero(np.asarray(m.actuator_gaintype) == GainType.AFFINE)[0]
    if len(ids):
      # dforce/dvel += gainprm[2] * input
      actadr = np.asarray(m.actuator_actadr)
      actnum = np.asarray(m.actuator_actnum)
      stateful = actadr >= 0
      if m.na:
        act_in = d.act[np.maximum(actadr + actnum - 1, 0)]
        ainput = jnp.where(jnp.asarray(stateful), act_in, d.ctrl)
      else:
        ainput = d.ctrl
      dgain = dgain.at[ids].add(m.actuator_gainprm[ids, 2] * ainput[ids])
    ids = np.nonzero(np.asarray(m.actuator_biastype) == BiasType.AFFINE)[0]
    if len(ids):
      dgain = dgain.at[ids].add(m.actuator_biasprm[ids, 2])
    qderiv = qderiv + d.actuator_moment.T @ (
        dgain[:, None] * d.actuator_moment
    )

  # passive damping
  if not (m.opt.disableflags & DisableBit.DAMPER):
    if m.has_dof_damping:
      qderiv = qderiv - jnp.diag(m.dof_damping)
    if m.ntendon and m.has_tendon_damping:
      qderiv = qderiv - d.ten_J.T @ (m.tendon_damping[:, None] * d.ten_J)

  # fluid-drag velocity derivative via jacfwd of the passive fluid
  # pipeline — the exact Newton linearization.  Oracle note: full Implicit
  # matches C's matrix to 5e-12; C's ImplicitFast uses an approximate
  # fluid linearization (recovered empirically: within-body off-diagonal
  # terms differ), so implicitfast+fluid trajectories track C loosely
  # (~1e-3) rather than bitwise — documented intentional deviation, the
  # exact Jacobian is the better implicit step.
  if m.opt.has_fluid_params and not (m.opt.disableflags & DisableBit.PASSIVE):
    from mjtpu._src import passive as passive_mod
    from mjtpu._src import smooth as smooth_mod

    def fluid_of(qvel):
      dd = d.replace(qvel=qvel)
      dd = smooth_mod.com_vel(m, dd)
      return passive_mod._fluid(m, dd)  # box and/or per-geom ellipsoid

    qderiv = qderiv + jax.jacfwd(fluid_of)(d.qvel)

  # RNE velocity derivative (full Implicit only): qfrc_smooth includes
  # -qfrc_bias, so qDeriv -= d(qfrc_bias)/dqvel.  The derivative is exactly
  # chain-patterned (a dof's bias force depends only on ancestor/descendant
  # velocities), so the mask below is a numerical no-op for it.
  if rne:
    from mjtpu._src import smooth

    def bias_of(qvel):
      dd = d.replace(qvel=qvel)
      dd = smooth.com_vel(m, dd)
      dd = smooth.rne(m, dd)
      return dd.qfrc_bias

    qderiv = qderiv - jax.jacfwd(bias_of)(d.qvel)

  # mj's qDeriv shares qM's kinematic-chain sparsity: cross terms between
  # non-ancestor dofs (tendon/actuator moments spanning trees or sibling
  # branches) are dropped by C — mask to match, which also keeps
  # qM − h·qDeriv block-diagonal per tree (smooth.mass_blocks)
  from mjtpu._src import smooth

  return qderiv * jnp.asarray(smooth.chain_pattern(m), dtype=dtype)
