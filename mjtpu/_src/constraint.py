"""Constraint assembly: efc rows for equality / friction / limit / contact.

Reference capability map: mujoco_torch/_src/constraint.py (make_constraint +
per-type instantiation + KBI solver-parameter transform, constraint.py:69-768).
Row layout is statically known per model: [equality (eq order) | dof+tendon
frictionloss | joint+tendon limits | contacts (condim-sorted groups)], padded
row counts are exact (no dynamic nefc), and rows deactivate themselves by
zeroed Jacobians — the natural JAX analog of the reference's zero-padding
(:729-748).

Verified row-for-row against MuJoCo C (efc_J/pos/margin/D/aref/frictionloss)
in tests/test_constraint.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src import math, support
from mjtpu._src.types import (
    ConeType,
    Data,
    DisableBit,
    EqType,
    JointType,
    Model,
)

# MuJoCo impedance clamps
_MINIMP = 0.0001
_MAXIMP = 0.9999


class _Rows(NamedTuple):
  """A block of constraint rows (all shapes lead with nrow)."""

  J: jax.Array             # (n, nv)
  pos: jax.Array           # (n,) constraint violation (aref input)
  pos_imp: jax.Array       # (n,) violation magnitude driving the impedance
                           # (equality blocks use the residual-vector norm)
  pos_out: jax.Array       # (n,) value written to efc_pos
  bias: jax.Array          # (n,) J̇q̇ acceleration bias (equality rows)
  margin: jax.Array        # (n,)
  invweight: jax.Array     # (n,)
  solref: jax.Array        # (n, 2)
  solimp: jax.Array        # (n, 5)
  frictionloss: jax.Array  # (n,)
  # regularization scale applied OUTSIDE the MINVAL floor:
  # R = r_scale * max(MINVAL, invweight*(1-imp)/imp).  MuJoCo floors the
  # base then scales (pyramidal 2*mu^2, elliptic friction 1/(impratio*
  # mu_ratio^2)) — the order only matters for degenerate zero-invweight
  # bodies, where scaling inside the floor gave D off by 2*mu^2
  # (found by the seed-38 fuzz hunt)
  r_scale: jax.Array | float = 1.0


def _kbi(m: Model, solref, solimp, pos):
  """Stiffness/damping/impedance from solver parameters (mj KBI transform,
  reference constraint.py:69-113).  pos is the (margin-adjusted) violation."""
  timeconst, dampratio = solref[:, 0], solref[:, 1]
  dmin = jnp.clip(solimp[:, 0], _MINIMP, _MAXIMP)
  dmax = jnp.clip(solimp[:, 1], _MINIMP, _MAXIMP)
  width = jnp.maximum(math.MINVAL, solimp[:, 2])
  mid = jnp.clip(solimp[:, 3], _MINIMP, _MAXIMP)
  power = jnp.maximum(1.0, solimp[:, 4])

  if not (m.opt.disableflags & DisableBit.REFSAFE):
    timeconst = jnp.maximum(timeconst, 2.0 * m.opt.timestep)

  k = 1.0 / jnp.maximum(math.MINVAL, dmax * dmax * timeconst * timeconst * dampratio * dampratio)
  b = 2.0 / jnp.maximum(math.MINVAL, dmax * timeconst)
  # direct (negative) solref: -stiffness, -damping
  k = jnp.where(solref[:, 0] <= 0, -solref[:, 0] / jnp.maximum(math.MINVAL, dmax * dmax), k)
  b = jnp.where(solref[:, 1] <= 0, -solref[:, 1] / jnp.maximum(math.MINVAL, dmax), b)

  x = jnp.abs(pos) / width
  y_low = (mid ** (1.0 - power)) * (x**power)
  y_high = 1.0 - ((1.0 - mid) ** (1.0 - power)) * ((1.0 - x) ** power)
  y = jnp.where(x < mid, y_low, y_high)
  imp = dmin + y * (dmax - dmin)
  imp = jnp.clip(imp, dmin, dmax)
  imp = jnp.where(x >= 1.0, dmax, imp)
  return k, b, imp


def _contact_jacobians(m: Model, d: Data):
  """Per-contact frame-projected Jacobian differences.

  Returns js (ncon, 3|6, nv): translational rows (frame-projected jacp
  difference) and, for condim > 3 use, rotational rows (frame-projected jacr
  difference).  Uses the static contact geom indices from the driver."""
  bodyid = jnp.asarray(np.asarray(m.geom_bodyid))
  rootid = jnp.asarray(np.asarray(m.body_rootid))
  b1 = bodyid[d.contact.geom1]
  b2 = bodyid[d.contact.geom2]

  mask_np = jnp.asarray(
      np.asarray(support.dof_ancestor_mask(m)), dtype=d.qpos.dtype
  )
  com1 = d.subtree_com[rootid[b1]]
  com2 = d.subtree_com[rootid[b2]]
  pos = d.contact.pos    # (ncon, 3)
  frame = d.contact.frame  # (ncon, 3, 3), rows = contact axes
  w = d.cdof[:, :3]      # (nv, 3) rotational dof axes
  v = d.cdof[:, 3:]      # (nv, 3) translational

  # jacp_k[j] = (v_j + w_j x off_k) * mask_k; jt[i, j] = f_i . (jacp2-jacp1)_j
  # Rewritten with the triple product f.(w x off) = w.(off x f) so each term
  # is a 3-contraction dot_general with an elementwise epilogue — the naive
  # per-contact (nv, 3) difference materialized a [B, ncon, nv, 3] temp that
  # XLA tile-padded 7.4x (8.6 GB at B=32k on humanoid).
  mask1 = mask_np[b1][:, None, :]  # (ncon, 1, nv)
  mask2 = mask_np[b2][:, None, :]
  fv = jnp.einsum("cik,jk->cij", frame, v)  # f_i . v_j
  g1 = jnp.cross((pos - com1)[:, None, :], frame)  # rows: off1 x f_i
  g2 = jnp.cross((pos - com2)[:, None, :], frame)
  wg1 = jnp.einsum("cik,jk->cij", g1, w)  # w_j . (off1 x f_i)
  wg2 = jnp.einsum("cik,jk->cij", g2, w)
  jt = mask2 * (fv + wg2) - mask1 * (fv + wg1)
  fw = jnp.einsum("cik,jk->cij", frame, w)  # f_i . w_j
  jr = (mask2 - mask1) * fw
  return jt, jr, (b1, b2)


def _quat_vec_map(u, v):
  """Matrix A with A @ w == vec(u * (0, w) * v) for quaternions u, v."""
  u0, uv = u[0], u[1:]
  v0, vv = v[0], v[1:]
  eye = jnp.eye(3, dtype=u.dtype)
  return (
      -jnp.outer(vv, uv)
      + (v0 * u0) * eye
      + v0 * math.cross_skew(uv)
      - u0 * math.cross_skew(vv)
      - math.cross_skew(vv) @ math.cross_skew(uv)
  )


def _vel_products(m: Model, d: Data):
  """(cvel, cacc_bias): com-frame velocities and velocity-product
  accelerations (no gravity, qacc = 0) — for the equality J̇q̇ bias."""
  from mjtpu._src import scan, smooth

  d_v = smooth.com_vel(m, d)

  def cacc_fn(carry, cdof_dot, qvel):
    cacc = jnp.zeros(6, dtype=qvel.dtype) if carry is None else carry
    return cacc + cdof_dot.T @ qvel

  cacc_bias = scan.body_tree(m, cacc_fn, "vv", "b", d_v.cdof_dot, d.qvel)
  return d_v.cvel, cacc_bias


def _point_acc_bias(m: Model, d: Data, cvel, cacc_bias, p, b: int):
  """Classical acceleration of body-fixed point p with qacc=0, no gravity."""
  rc = d.subtree_com[int(m.body_rootid[b])]
  off = p - rc
  w = cvel[b, :3]
  v_p = cvel[b, 3:] - jnp.cross(off, w)
  a_lin = cacc_bias[b, 3:] - jnp.cross(off, cacc_bias[b, :3])
  return a_lin + jnp.cross(w, v_p)


def _eq_rows(m: Model, d: Data) -> list[_Rows]:
  """Equality constraint rows, in eq-constraint order.

  aref for equality rows includes the -J̇q̇ bias so the row prescribes the
  true residual acceleration (matches MuJoCo C; the KBI spring-damper alone
  reproduces neither efc_aref nor trajectories)."""
  dtype = d.qpos.dtype
  rows = []
  if not m.neq:
    return rows

  eq_types = [int(t) for t in m.eq_type]
  need_vp = any(t in (EqType.CONNECT, EqType.WELD) for t in eq_types)
  if need_vp:
    cvel, cacc_bias = _vel_products(m, d)

  def P(w):
    return jnp.concatenate([jnp.zeros(1, dtype), w])

  for e in range(m.neq):
    etype = EqType(eq_types[e])
    active = d.eq_active[e].astype(dtype)
    data = m.eq_data[e]
    solref = jnp.broadcast_to(m.eq_solref[e], (1, 2))
    solimp = jnp.broadcast_to(m.eq_solimp[e], (1, 5))

    if etype == EqType.CONNECT:
      b1, b2 = int(m.eq_obj1id[e]), int(m.eq_obj2id[e])
      anchor1, anchor2 = data[0:3], data[3:6]
      pos1 = d.xmat[b1] @ anchor1 + d.xpos[b1]
      pos2 = d.xmat[b2] @ anchor2 + d.xpos[b2]
      cpos = pos1 - pos2
      jacp1, _ = support.jac(m, d, pos1, b1)
      jacp2, _ = support.jac(m, d, pos2, b2)
      j = (jacp1 - jacp2).T * active  # (3, nv)
      bias = _point_acc_bias(m, d, cvel, cacc_bias, pos1, b1) - _point_acc_bias(
          m, d, cvel, cacc_bias, pos2, b2
      )
      invw = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
      rows.append(
          _Rows(
              J=j,
              pos=cpos * active,
              pos_imp=jnp.full((3,), math.safe_norm(cpos), dtype),
              pos_out=cpos * active,
              bias=bias * active,
              margin=jnp.zeros(3, dtype),
              invweight=jnp.full((3,), invw, dtype),
              solref=jnp.broadcast_to(solref, (3, 2)),
              solimp=jnp.broadcast_to(solimp, (3, 5)),
              frictionloss=jnp.zeros(3, dtype),
          )
      )
    elif etype == EqType.WELD:
      b1, b2 = int(m.eq_obj1id[e]), int(m.eq_obj2id[e])
      # weld data layout: [anchor in body2 (3), anchor in body1 (3),
      # relpose quat (4), torquescale (1)]
      anchor2, anchor1 = data[0:3], data[3:6]
      relpose = data[6:10]
      torquescale = data[10]

      pos1 = d.xmat[b1] @ anchor1 + d.xpos[b1]
      pos2 = d.xmat[b2] @ anchor2 + d.xpos[b2]
      cpos = pos1 - pos2
      jacp1, jacr1 = support.jac(m, d, pos1, b1)
      jacp2, jacr2 = support.jac(m, d, pos2, b2)
      jp = (jacp1 - jacp2).T  # (3, nv)
      bias_p = _point_acc_bias(m, d, cvel, cacc_bias, pos1, b1) - _point_acc_bias(
          m, d, cvel, cacc_bias, pos2, b2
      )

      # rotational residual: r = ts * vec(q2^-1 * (q1 * relpose))
      q1r = math.quat_mul(d.xquat[b1], relpose)
      u = math.quat_inv(d.xquat[b2])
      v = q1r
      q_err = math.quat_mul(u, v)
      crot = q_err[1:] * torquescale
      # dr/dt = ts/2 * A (w1 - w2): rows of the rotational jacobian
      amat = _quat_vec_map(u, v)
      jr = (0.5 * torquescale) * (amat @ (jacr1 - jacr2).T)  # (3, nv)
      # velocity-product bias of the rotational residual
      w1 = cvel[b1, :3]
      w2 = cvel[b2, :3]
      dw = w1 - w2
      dwb = cacc_bias[b1, :3] - cacc_bias[b2, :3]
      qdd = 0.5 * (
          math.quat_mul(u, math.quat_mul(P(dwb), v))
          + 0.5 * math.quat_mul(u, math.quat_mul(P(dw), math.quat_mul(P(w1), v)))
          - 0.5 * math.quat_mul(u, math.quat_mul(P(w2), math.quat_mul(P(dw), v)))
      )
      bias_r = torquescale * qdd[1:]

      j6 = jnp.concatenate([jp, jr]) * active
      cpos6 = jnp.concatenate([cpos, crot]) * active
      bias6 = jnp.concatenate([bias_p, bias_r]) * active
      invw_t = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
      invw_r = m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1]
      invw6 = jnp.concatenate([
          jnp.full((3,), invw_t, dtype), jnp.full((3,), invw_r, dtype)
      ])
      rows.append(
          _Rows(
              J=j6,
              pos=cpos6,
              pos_imp=jnp.full((6,), math.safe_norm(cpos6), dtype),
              pos_out=cpos6,
              bias=bias6,
              margin=jnp.zeros(6, dtype),
              invweight=invw6,
              solref=jnp.broadcast_to(solref, (6, 2)),
              solimp=jnp.broadcast_to(solimp, (6, 5)),
              frictionloss=jnp.zeros(6, dtype),
          )
      )
    elif etype == EqType.JOINT:
      j1 = int(m.eq_obj1id[e])
      j2 = int(m.eq_obj2id[e])
      q1adr, d1adr = int(m.jnt_qposadr[j1]), int(m.jnt_dofadr[j1])
      pos1 = d.qpos[q1adr] - m.qpos0[q1adr]
      if j2 > -1:
        q2adr, d2adr = int(m.jnt_qposadr[j2]), int(m.jnt_dofadr[j2])
        dif = d.qpos[q2adr] - m.qpos0[q2adr]
        vel2 = d.qvel[d2adr]
      else:
        dif = jnp.zeros((), dtype)
        vel2 = jnp.zeros((), dtype)
      # polynomial coupling and its derivatives
      pows = dif ** jnp.arange(5, dtype=dtype)
      cpos = pos1 - jnp.dot(data[:5], pows)
      deriv = jnp.dot(
          data[1:5],
          jnp.arange(1, 5, dtype=dtype) * (dif ** jnp.arange(4, dtype=dtype)),
      )
      deriv2 = jnp.dot(
          data[2:5],
          jnp.array([2.0, 6.0, 12.0], dtype=dtype)
          * (dif ** jnp.arange(3, dtype=dtype)),
      )
      # joint equality has no J̇q̇ term in MuJoCo's aref (oracle-verified)
      bias = jnp.zeros((), dtype)
      j = jnp.zeros((1, m.nv), dtype).at[0, d1adr].set(1.0)
      if j2 > -1:
        j = j.at[0, d2adr].set(-deriv)
      j = j * active
      invw = m.dof_invweight0[d1adr]
      if j2 > -1:
        invw = invw + m.dof_invweight0[d2adr]
      rows.append(
          _Rows(
              J=j,
              pos=cpos[None] * active,
              pos_imp=jnp.abs(cpos)[None],
              pos_out=cpos[None] * active,
              bias=bias[None] * active,
              margin=jnp.zeros(1, dtype),
              invweight=invw[None],
              solref=solref,
              solimp=solimp,
              frictionloss=jnp.zeros(1, dtype),
          )
      )
    elif etype == EqType.TENDON:
      # tendon length coupling: len1 - len1_0 = poly(len2 - len2_0)
      # (mj_instantiateEquality's mjEQ_TENDON branch — the joint pattern
      # over ten_length/ten_J instead of qpos/unit dof rows)
      t1 = int(m.eq_obj1id[e])
      t2 = int(m.eq_obj2id[e])
      pos1 = d.ten_length[t1] - m.tendon_length0[t1]
      if t2 > -1:
        dif = d.ten_length[t2] - m.tendon_length0[t2]
      else:
        dif = jnp.zeros((), dtype)
      pows = dif ** jnp.arange(5, dtype=dtype)
      cpos = pos1 - jnp.dot(data[:5], pows)
      deriv = jnp.dot(
          data[1:5],
          jnp.arange(1, 5, dtype=dtype) * (dif ** jnp.arange(4, dtype=dtype)),
      )
      j = d.ten_J[t1]
      if t2 > -1:
        j = j - deriv * d.ten_J[t2]
      j = j[None] * active
      invw = m.tendon_invweight0[t1]
      if t2 > -1:
        invw = invw + m.tendon_invweight0[t2]
      rows.append(
          _Rows(
              J=j,
              pos=cpos[None] * active,
              pos_imp=jnp.abs(cpos)[None],
              pos_out=cpos[None] * active,
              bias=jnp.zeros(1, dtype),
              margin=jnp.zeros(1, dtype),
              invweight=invw[None],
              solref=solref,
              solimp=solimp,
              frictionloss=jnp.zeros(1, dtype),
          )
      )
    else:
      raise NotImplementedError(etype)
  return rows


def _friction_rows(m: Model, d: Data) -> list[_Rows]:
  dtype = d.qpos.dtype
  rows = []
  dofs = np.asarray(m.friction_dofid)
  if len(dofs):
    j = jnp.zeros((len(dofs), m.nv), dtype).at[np.arange(len(dofs)), dofs].set(1.0)
    rows.append(
        _Rows(
            J=j,
            pos=jnp.zeros(len(dofs), dtype),
            pos_imp=jnp.zeros(len(dofs), dtype),
            pos_out=jnp.zeros(len(dofs), dtype),
            bias=jnp.zeros(len(dofs), dtype),
            margin=jnp.zeros(len(dofs), dtype),
            invweight=m.dof_invweight0[dofs],
            solref=m.dof_solref[dofs],
            solimp=m.dof_solimp[dofs],
            frictionloss=m.dof_frictionloss[dofs],
        )
    )
  tens = np.asarray(m.friction_tenid)
  if len(tens):
    rows.append(
        _Rows(
            J=d.ten_J[tens],
            pos=jnp.zeros(len(tens), dtype),
            pos_imp=jnp.zeros(len(tens), dtype),
            pos_out=jnp.zeros(len(tens), dtype),
            bias=jnp.zeros(len(tens), dtype),
            margin=jnp.zeros(len(tens), dtype),
            invweight=m.tendon_invweight0[tens],
            solref=m.tendon_solref_fri[tens],
            solimp=m.tendon_solimp_fri[tens],
            frictionloss=m.tendon_frictionloss[tens],
        )
    )
  return rows


def _limit_rows(m: Model, d: Data) -> list[_Rows]:
  """Limit rows: joints batched per category (one-sided slide/hinge,
  two-sided slide/hinge, ball), then statically permuted back to mj joint
  order; tendons follow.  One scatter per category instead of one per
  joint — the per-joint [1, nv] scatters each materialized a fully padded
  (8, 128)-tiled temp under vmap (≈130x memory blowup at large batch)."""
  dtype = d.qpos.dtype
  rows = []
  limited = np.nonzero(np.asarray(m.jnt_limited))[0]
  jt = np.asarray(m.jnt_type)

  if len(limited):
    two = np.asarray(m.jnt_limit_two_sided).astype(bool)
    is_sh = np.isin(jt[limited], (JointType.SLIDE, JointType.HINGE))
    is_ball = jt[limited] == JointType.BALL
    bad = limited[~(is_sh | is_ball)]
    if len(bad):
      raise NotImplementedError(
          f"limit on joint type {JointType(int(jt[bad[0]]))}"
      )
    sh1 = limited[is_sh & ~two[limited]]
    sh2 = limited[is_sh & two[limited]]
    ball = limited[is_ball]
    qposadr, dofadr = np.asarray(m.jnt_qposadr), np.asarray(m.jnt_dofadr)
    parts = []

    if len(sh1):
      n = len(sh1)
      dadr = dofadr[sh1]
      q = d.qpos[qposadr[sh1]]
      dist_min = q - m.jnt_range[sh1, 0]
      dist_max = m.jnt_range[sh1, 1] - q
      margin = m.jnt_margin[sh1]
      # wide range: at most one side is ever within margin, so the
      # min-side single row is exactly C's materialized row
      pos = jnp.minimum(dist_min, dist_max) - margin
      side = jnp.where(dist_min < dist_max, 1.0, -1.0).astype(dtype)
      active = (pos < 0).astype(dtype)
      # one-hot placement constant: a fusable broadcast-multiply, not a scatter
      onehot = np.zeros((n, m.nv), np.float32)
      onehot[np.arange(n), dadr] = 1.0
      J = jnp.asarray(onehot, dtype) * (side * active)[:, None]
      parts.append(
          _Rows(
              J=J,
              pos=pos,
              pos_imp=pos,
              pos_out=pos,
              bias=jnp.zeros(n, dtype),
              margin=margin,
              invweight=m.dof_invweight0[dadr],
              solref=m.jnt_solref[sh1],
              solimp=m.jnt_solimp[sh1],
              frictionloss=jnp.zeros(n, dtype),
          )
      )

    if len(sh2):
      # range narrower than 2*margin: C can emit BOTH side rows at once
      # (oracle-probed), lower then upper, each gated on its own side
      n = len(sh2)
      dadr = dofadr[sh2]
      q = d.qpos[qposadr[sh2]]
      dist_min = q - m.jnt_range[sh2, 0]
      dist_max = m.jnt_range[sh2, 1] - q
      margin = m.jnt_margin[sh2]
      pos = jnp.stack([dist_min, dist_max], axis=1).reshape(2 * n)
      pos = pos - jnp.repeat(margin, 2)
      side = jnp.tile(jnp.asarray([1.0, -1.0], dtype), n)
      active = (pos < 0).astype(dtype)
      onehot = np.zeros((2 * n, m.nv), np.float32)
      onehot[np.arange(2 * n), np.repeat(dadr, 2)] = 1.0
      J = jnp.asarray(onehot, dtype) * (side * active)[:, None]
      parts.append(
          _Rows(
              J=J,
              pos=pos,
              pos_imp=pos,
              pos_out=pos,
              bias=jnp.zeros(2 * n, dtype),
              margin=jnp.repeat(margin, 2),
              invweight=jnp.repeat(m.dof_invweight0[dadr], 2),
              solref=jnp.repeat(m.jnt_solref[sh2], 2, axis=0),
              solimp=jnp.repeat(m.jnt_solimp[sh2], 2, axis=0),
              frictionloss=jnp.zeros(2 * n, dtype),
          )
      )

    if len(ball):
      n = len(ball)
      dadr = dofadr[ball]
      quat = d.qpos[qposadr[ball][:, None] + np.arange(4)]  # (n, 4)
      axis, angle = jax.vmap(
          lambda q: math.normalize_with_norm(math.quat_to_vel(q))
      )(quat)
      # C parity at zero rotation: mju_normalize3 leaves (1,0,0) for a
      # degenerate input, and the row can be live there via the margin
      axis = jnp.where(
          (angle < math.MINVAL)[:, None],
          jnp.asarray([1.0, 0.0, 0.0], dtype),
          axis,
      )
      ang_limit = jnp.maximum(
          jnp.abs(m.jnt_range[ball, 0]), jnp.abs(m.jnt_range[ball, 1])
      )
      margin = m.jnt_margin[ball]
      pos = ang_limit - angle - margin
      active = (pos < 0).astype(dtype)
      # static (n, 3, nv) axis-placement one-hot: J[i, dadr_i + k] = vals[i, k]
      place = np.zeros((n, 3, m.nv), np.float32)
      place[np.arange(n)[:, None], np.arange(3), dadr[:, None] + np.arange(3)] = 1.0
      J = jnp.einsum("nk,nkv->nv", -axis * active[:, None], jnp.asarray(place, dtype))
      parts.append(
          _Rows(
              J=J,
              pos=pos,
              pos_imp=pos,
              pos_out=pos,
              bias=jnp.zeros(n, dtype),
              margin=margin,
              invweight=m.dof_invweight0[dadr],
              solref=m.jnt_solref[ball],
              solimp=m.jnt_solimp[ball],
              frictionloss=jnp.zeros(n, dtype),
          )
      )

    # static permutation from category-concatenated order to mj joint order
    starts, base = {}, 0
    for cat, per in ((sh1, 1), (sh2, 2), (ball, 1)):
      for p, j in enumerate(cat):
        starts[j] = (base + per * p, per)
      base += per * len(cat)
    perm = np.concatenate(
        [np.arange(s, s + c) for j in limited for s, c in (starts[j],)]
    )
    if len(parts) == 1:
      block = parts[0]
    else:
      block = _Rows(*(
          jnp.concatenate([getattr(p, f) for p in parts])
          for f in _Rows._fields[:-1]
      ))
    if not np.array_equal(perm, np.arange(len(perm))):
      block = _Rows(*(getattr(block, f)[perm] for f in _Rows._fields[:-1]))
    rows.append(block)

  tens = np.nonzero(np.asarray(m.tendon_limited))[0]
  if len(tens):
    margin = m.tendon_margin[tens]
    length = d.ten_length[tens]
    dist_min = length - m.tendon_range[tens, 0]
    dist_max = m.tendon_range[tens, 1] - length
    pos = jnp.minimum(dist_min, dist_max) - margin
    # +J pushes length up (lower limit active), -J down (upper active) —
    # +J pushes length up (lower limit active), -J down (upper active) —
    # same side convention as the scalar-joint rows above
    k = len(tens)
    if support.tendon_limit_rows_per(m) == 2:
      # some range is narrower than 2*margin: one row PER SIDE per tendon,
      # lower then upper, interleaved in tendon order (C emits both)
      pos = jnp.stack([dist_min, dist_max], axis=1).reshape(
          2 * k
      ) - jnp.repeat(margin, 2)
      side = jnp.tile(jnp.asarray([1.0, -1.0], dtype), k)
      ten_J = jnp.repeat(d.ten_J[tens], 2, axis=0)
      rep = lambda x: jnp.repeat(x, 2, axis=0)
      n = 2 * k
    else:
      # wide ranges: the min-side single row is exactly C's materialized row
      pos = jnp.minimum(dist_min, dist_max) - margin
      side = jnp.where(dist_min < dist_max, 1.0, -1.0).astype(dtype)
      ten_J = d.ten_J[tens]
      rep = lambda x: x
      n = k
    active = (pos < 0).astype(dtype)
    rows.append(
        _Rows(
            J=(side * active)[:, None] * ten_J,
            pos=pos,
            pos_imp=pos,
            pos_out=pos,
            bias=jnp.zeros(n, dtype),
            margin=rep(margin),
            invweight=rep(m.tendon_invweight0[tens]),
            solref=rep(m.tendon_solref_lim[tens]),
            solimp=rep(m.tendon_solimp_lim[tens]),
            frictionloss=jnp.zeros(n, dtype),
        )
    )
  return rows


def _contact_rows(m: Model, d: Data) -> list[_Rows]:
  """Contact rows, vectorized per condim group (contacts arrive
  condim-sorted from the driver, so groups are contiguous)."""
  from mjtpu._src import collision_driver

  dtype = d.qpos.dtype
  ncon = collision_driver.ncon(m)
  if ncon == 0:
    return []

  con = d.contact
  jt, jr, (b1, b2) = _contact_jacobians(m, d)
  dims = collision_driver.make_condim(m)
  invweight_c = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]  # (ncon,)

  pos_all = con.dist - con.includemargin
  active_all = (pos_all < 0).astype(dtype)

  # contacts-from-distance (differentiable mode): soft activation within
  # cfd_width + softplus-smoothed penetration with a straight-through
  # estimator (reference constraint.py:697-726)
  from mjtpu._src.diff_config import get_diff_config

  cfg = get_diff_config()
  if cfg is not None and cfg.cfd:
    soft_act = jax.nn.sigmoid(-pos_all / cfg.cfd_width)
    hard_act = (pos_all < cfg.cfd_width).astype(dtype)
    active_all = soft_act + jax.lax.stop_gradient(hard_act - soft_act)
    pos_soft = -cfg.cfd_dc * jax.nn.softplus(-pos_all / cfg.cfd_dc)
    pos_all = pos_soft + jax.lax.stop_gradient(pos_all - pos_soft)

  rows = []
  pyramidal = m.opt.cone == ConeType.PYRAMIDAL
  for condim in sorted(set(int(c) for c in dims)):
    idx = np.nonzero(dims == condim)[0]
    k = len(idx)
    jn = jt[idx, 0]                     # (k, nv) normal rows
    pos = pos_all[idx]                  # (k,)
    active = active_all[idx]
    mu = con.friction[idx]              # (k, 5)
    solref = con.solref[idx]            # (k, 2)
    solimp = con.solimp[idx]            # (k, 5)
    iw = invweight_c[idx]               # (k,)

    if condim == 1:
      J = jn[:, None, :] * active[:, None, None]
      n_rows = 1
      invw = iw[:, None]
      rscale = jnp.ones((k, 1), dtype)
      sr = solref[:, None, :]
      posr = pos[:, None]
    else:
      # tangent rows: translational first, then rotational (condim > 3)
      tang = jnp.concatenate(
          [jt[idx, 1:3], jr[idx, : condim - 3]], axis=1
      )  # (k, condim-1, nv)
      f = mu[:, : condim - 1]           # (k, condim-1)
      if pyramidal:
        plus = jn[:, None, :] + f[..., None] * tang
        minus = jn[:, None, :] - f[..., None] * tang
        J = jnp.stack([plus, minus], axis=2).reshape(k, 2 * (condim - 1), -1)
        J = J * active[:, None, None]
        n_rows = 2 * (condim - 1)
        # all pyramid rows share the friction[0]-based invweight (mj C);
        # the 2*mu^2 factor scales outside the R floor (see _Rows.r_scale)
        iw_p = iw + mu[:, 0] ** 2 * iw
        invw = jnp.broadcast_to(iw_p[:, None], (k, n_rows))
        rscale = jnp.broadcast_to(
            (2.0 * mu[:, 0] ** 2)[:, None], (k, n_rows)
        )
        sr = jnp.broadcast_to(solref[:, None, :], (k, n_rows, 2))
        posr = jnp.broadcast_to(pos[:, None], (k, n_rows))
      else:  # elliptic
        J = jnp.concatenate([jn[:, None, :], tang], axis=1)
        J = J * active[:, None, None]
        n_rows = condim
        # friction-row regularization: D_i = D_n * impratio * (mu_i/mu_0)^2
        # — applied outside the R floor (see _Rows.r_scale)
        mu_ratio2 = (f / jnp.maximum(math.MINVAL, mu[:, :1])) ** 2
        invw = jnp.broadcast_to(iw[:, None], (k, n_rows))
        rscale = jnp.concatenate(
            [
                jnp.ones((k, 1), dtype),
                1.0 / jnp.maximum(math.MINVAL, m.opt.impratio * mu_ratio2),
            ],
            axis=1,
        )
        # friction rows use solreffriction when nonzero
        use_srf = jnp.any(con.solreffriction[idx] != 0.0, axis=1, keepdims=True)
        srf_row = jnp.where(use_srf, con.solreffriction[idx], solref)
        sr = jnp.concatenate(
            [solref[:, None, :], jnp.broadcast_to(srf_row[:, None, :], (k, condim - 1, 2))],
            axis=1,
        )
        # friction rows have zero position (no normal coupling)
        posr = jnp.concatenate(
            [pos[:, None], jnp.zeros((k, condim - 1), dtype)], axis=1
        )

    total = k * n_rows
    rows.append(
        _Rows(
            J=J.reshape(total, m.nv),
            pos=posr.reshape(total),
            pos_imp=jnp.broadcast_to(pos[:, None], (k, n_rows)).reshape(total),
            pos_out=jnp.broadcast_to(con.dist[idx, None], (k, n_rows)).reshape(total),
            bias=jnp.zeros(total, dtype),
            margin=jnp.broadcast_to(
                con.includemargin[idx, None], (k, n_rows)
            ).reshape(total),
            invweight=invw.reshape(total),
            solref=sr.reshape(total, 2),
            solimp=jnp.broadcast_to(solimp[:, None, :], (k, n_rows, 5)).reshape(total, 5),
            frictionloss=jnp.zeros(total, dtype),
            r_scale=rscale.reshape(total),
        )
    )
  return rows


def make_constraint(m: Model, d: Data) -> Data:
  """Assembles all constraint rows into efc_* (mj_makeConstraint)."""
  dtype = d.qpos.dtype
  ne, nf, nl, nefc = support.count_constraints(m)

  if nefc == 0:
    return d.replace(
        efc_J=jnp.zeros((0, m.nv), dtype),
        efc_pos=jnp.zeros(0, dtype),
        efc_margin=jnp.zeros(0, dtype),
        efc_frictionloss=jnp.zeros(0, dtype),
        efc_D=jnp.zeros(0, dtype),
        efc_aref=jnp.zeros(0, dtype),
        efc_force=jnp.zeros(0, dtype),
    )

  rows: list[_Rows] = []
  if not (m.opt.disableflags & DisableBit.EQUALITY):
    rows += _eq_rows(m, d)
  if not (m.opt.disableflags & DisableBit.FRICTIONLOSS):
    rows += _friction_rows(m, d)
  if not (m.opt.disableflags & DisableBit.LIMIT):
    rows += _limit_rows(m, d)
  if not (m.opt.disableflags & DisableBit.CONTACT):
    rows += _contact_rows(m, d)

  J = jnp.concatenate([r.J for r in rows])
  pos = jnp.concatenate([r.pos for r in rows])
  pos_imp = jnp.concatenate([r.pos_imp for r in rows])
  pos_out = jnp.concatenate([r.pos_out for r in rows])
  margin = jnp.concatenate([r.margin for r in rows])
  invweight = jnp.concatenate([r.invweight for r in rows])
  r_scale = jnp.concatenate([
      jnp.broadcast_to(jnp.asarray(r.r_scale, dtype), r.pos.shape)
      for r in rows
  ])
  solref = jnp.concatenate([r.solref for r in rows])
  solimp = jnp.concatenate([r.solimp for r in rows])
  frictionloss = jnp.concatenate([r.frictionloss for r in rows])

  bias = jnp.concatenate([r.bias for r in rows])
  k, b, imp = _kbi(m, solref, solimp, pos_imp)
  jv = J @ d.qvel
  aref = -b * jv - k * imp * pos - bias
  # mj floors the base regularizer, THEN applies the row scale (pyramidal
  # 2*mu^2 / elliptic friction-row divisor) — the order matters for
  # degenerate zero-invweight rows (see _Rows.r_scale)
  R = r_scale * jnp.maximum(
      math.MINVAL, invweight * (1.0 - imp) / jnp.maximum(math.MINVAL, imp)
  )
  # no re-floor after scaling (C reports D = 1/R even for R below MINVAL);
  # the tiny guard only prevents literal division by zero
  D = 1.0 / jnp.maximum(jnp.finfo(dtype).tiny, R)

  return d.replace(
      efc_J=J,
      efc_pos=pos_out,
      efc_margin=margin,
      efc_frictionloss=frictionloss,
      efc_D=D,
      efc_aref=aref,
      efc_force=jnp.zeros(nefc, dtype),
  )
