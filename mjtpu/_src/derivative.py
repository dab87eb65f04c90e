"""Analytic smooth-dynamics derivatives for implicit integration.

Reference capability map: mujoco_torch/_src/derivative.py
(deriv_smooth_vel: d(qfrc_actuator + qfrc_passive)/dqvel for ImplicitFast).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src.types import BiasType, Data, DisableBit, DynType, GainType, Model


def deriv_smooth_vel(m: Model, d: Data) -> jax.Array:
  """(nv, nv) derivative of smooth forces w.r.t. qvel (mjd_smooth_vel subset).

  Covers: affine actuator gain/bias velocity terms, joint damping, tendon
  damping.  Fluid-model derivatives are unsupported (parity with reference
  derivative.py:22-68)."""
  if m.opt.has_fluid_params:
    raise NotImplementedError(
        "implicitfast integration with fluid drag is not supported"
    )
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

  # mj's qDeriv shares qM's kinematic-chain sparsity: cross terms between
  # non-ancestor dofs (tendon/actuator moments spanning trees or sibling
  # branches) are dropped by C — mask to match, which also keeps
  # qM − h·qDeriv block-diagonal per tree (smooth.mass_blocks)
  from mjtpu._src import smooth

  return qderiv * jnp.asarray(smooth.chain_pattern(m), dtype=dtype)
