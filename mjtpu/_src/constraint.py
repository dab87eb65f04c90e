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
  from mjtpu._src import collision_driver

  groups = collision_driver.candidate_groups(m)
  g1s, g2s = [], []
  for key, pairs in groups.items():
    n_per = collision_driver._PAIR_NCON[key[:2]]
    g1s += [p[0] for p in pairs for _ in range(n_per)]
    g2s += [p[1] for p in pairs for _ in range(n_per)]
  g1 = np.array(g1s, dtype=np.int64)
  g2 = np.array(g2s, dtype=np.int64)
  b1 = np.asarray(m.geom_bodyid)[g1]
  b2 = np.asarray(m.geom_bodyid)[g2]

  mask = np.asarray(support.dof_ancestor_mask(m))
  mask_dif = jnp.asarray(mask[b2] - mask[b1], dtype=d.qpos.dtype)  # (ncon, nv)

  com1 = d.subtree_com[np.asarray(m.body_rootid)[b1]]
  com2 = d.subtree_com[np.asarray(m.body_rootid)[b2]]
  pos = d.contact.pos  # (ncon, 3)

  def one(mask1, mask2, c1, c2, p, frame):
    off1 = p - c1
    off2 = p - c2
    jacp1 = (d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], off1[None, :])) * mask1[:, None]
    jacp2 = (d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], off2[None, :])) * mask2[:, None]
    jacr1 = d.cdof[:, :3] * mask1[:, None]
    jacr2 = d.cdof[:, :3] * mask2[:, None]
    jt = frame @ (jacp2 - jacp1).T  # (3, nv)
    jr = frame @ (jacr2 - jacr1).T  # (3, nv)
    return jt, jr

  mask1 = jnp.asarray(mask[b1], dtype=d.qpos.dtype)
  mask2 = jnp.asarray(mask[b2], dtype=d.qpos.dtype)
  jt, jr = jax.vmap(one)(mask1, mask2, com1, com2, pos, d.contact.frame)
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
  dtype = d.qpos.dtype
  rows = []
  for j in np.nonzero(np.asarray(m.jnt_limited))[0]:
    jt = JointType(int(m.jnt_type[j]))
    qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
    margin = m.jnt_margin[j]
    if jt in (JointType.SLIDE, JointType.HINGE):
      dist_min = d.qpos[qadr] - m.jnt_range[j, 0]
      dist_max = m.jnt_range[j, 1] - d.qpos[qadr]
      pos = jnp.minimum(dist_min, dist_max) - margin
      side = jnp.where(dist_min < dist_max, 1.0, -1.0).astype(dtype)
      active = (pos < 0).astype(dtype)
      jrow = jnp.zeros((1, m.nv), dtype).at[0, dadr].set(side * active)
    elif jt == JointType.BALL:
      axis, angle = math.normalize_with_norm(
          math.quat_to_vel(d.qpos[qadr : qadr + 4])
      )
      ang_limit = jnp.maximum(
          jnp.abs(m.jnt_range[j, 0]), jnp.abs(m.jnt_range[j, 1])
      )
      pos = ang_limit - angle - margin
      active = (pos < 0).astype(dtype)
      jrow = jnp.zeros((1, m.nv), dtype)
      jrow = jrow.at[0, dadr : dadr + 3].set(-axis * active)
    else:
      raise NotImplementedError(f"limit on joint type {jt}")
    rows.append(
        _Rows(
            J=jrow,
            pos=pos[None],
            pos_imp=pos[None],
            pos_out=pos[None],
            bias=jnp.zeros(1, dtype),
            margin=jnp.full((1,), margin, dtype),
            invweight=m.dof_invweight0[dadr][None],
            solref=m.jnt_solref[j][None],
            solimp=m.jnt_solimp[j][None],
            frictionloss=jnp.zeros(1, dtype),
        )
    )
  for t in np.nonzero(np.asarray(m.tendon_limited))[0]:
    margin = m.tendon_margin[t]
    length = d.ten_length[t]
    dist_min = length - m.tendon_range[t, 0]
    dist_max = m.tendon_range[t, 1] - length
    pos = jnp.minimum(dist_min, dist_max) - margin
    side = jnp.where(dist_min < dist_max, -1.0, 1.0).astype(dtype)
    active = (pos < 0).astype(dtype)
    rows.append(
        _Rows(
            J=(side * active) * d.ten_J[t][None],
            pos=pos[None],
            pos_imp=pos[None],
            pos_out=pos[None],
            bias=jnp.zeros(1, dtype),
            margin=margin[None],
            invweight=m.tendon_invweight0[t][None],
            solref=m.tendon_solref_lim[t][None],
            solimp=m.tendon_solimp_lim[t][None],
            frictionloss=jnp.zeros(1, dtype),
        )
    )
  return rows


def _contact_rows(m: Model, d: Data) -> list[_Rows]:
  """Contact rows, in contact (group/condim-sorted) order."""
  from mjtpu._src import collision_driver

  dtype = d.qpos.dtype
  ncon = collision_driver.ncon(m)
  if ncon == 0:
    return []

  con = d.contact
  jt, jr, (b1, b2) = _contact_jacobians(m, d)
  dims = collision_driver.make_condim(m)
  invweight_c = (
      m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
  )  # (ncon,)

  pos_all = con.dist - con.includemargin  # violation
  active_all = (pos_all < 0).astype(dtype)

  rows = []
  pyramidal = m.opt.cone == ConeType.PYRAMIDAL
  for c in range(ncon):
    condim = int(dims[c])
    pos = pos_all[c]
    active = active_all[c]
    mu = con.friction[c]
    solref = con.solref[c]
    solimp = con.solimp[c]
    jn = jt[c, 0]  # normal row
    if condim == 1:
      j = (jn * active)[None]
      n = 1
      invw = invweight_c[c][None]
      sr = solref[None]
      srf = jnp.zeros_like(sr)
      fri = jnp.zeros(1, dtype)
    elif pyramidal:
      n = 2 * (condim - 1)
      jlist = []
      invws = []
      # all pyramid rows share the friction[0]-based invweight (mj C)
      iw = (invweight_c[c] + mu[0] * mu[0] * invweight_c[c]) * 2.0 * mu[0] * mu[0]
      for k in range(condim - 1):
        tangent = jt[c, 1 + k] if k < 2 else jr[c, k - 2]
        f = mu[k]
        jlist.append(jn + f * tangent)
        jlist.append(jn - f * tangent)
        invws += [iw, iw]
      j = jnp.stack(jlist) * active
      invw = jnp.stack(invws)
      sr = jnp.broadcast_to(solref, (n, 2))
      srf = jnp.zeros_like(sr)
      fri = jnp.zeros(n, dtype)
    else:  # elliptic
      n = condim
      jlist = [jn]
      for k in range(condim - 1):
        tangent = jt[c, 1 + k] if k < 2 else jr[c, k - 2]
        jlist.append(tangent)
      j = jnp.stack(jlist) * active
      invw_n = invweight_c[c]
      # friction-row regularization: D_i = D_n * impratio * (mu_i/mu_0)^2
      mu_ratio2 = (mu[:n - 1] / jnp.maximum(math.MINVAL, mu[0])) ** 2
      invw_f = invw_n / jnp.maximum(
          math.MINVAL, m.opt.impratio * mu_ratio2
      )
      invw = jnp.concatenate([invw_n[None], invw_f])
      sr = jnp.broadcast_to(solref, (n, 2))
      # friction rows use solreffriction when nonzero
      use_srf = jnp.any(con.solreffriction[c] != 0.0)
      srf_row = jnp.where(use_srf, con.solreffriction[c], solref)
      sr = jnp.concatenate([solref[None], jnp.broadcast_to(srf_row, (n - 1, 2))])
      srf = jnp.zeros_like(sr)
      fri = jnp.zeros(n, dtype)

    pos_rows = jnp.full((n,), pos, dtype) if not pyramidal or condim == 1 else jnp.full((n,), pos, dtype)
    # friction rows of elliptic cones have zero position (no normal coupling)
    if not pyramidal and condim > 1:
      pos_rows = jnp.concatenate([pos[None], jnp.zeros(n - 1, dtype)])
    rows.append(
        _Rows(
            J=j,
            pos=pos_rows,
            pos_imp=jnp.full((n,), pos, dtype),
            pos_out=jnp.full((n,), con.dist[c], dtype),  # efc_pos = raw dist (mj)
            bias=jnp.zeros(n, dtype),
            margin=jnp.full((n,), con.includemargin[c], dtype),
            invweight=invw,
            solref=sr,
            solimp=jnp.broadcast_to(solimp, (n, 5)),
            frictionloss=fri,
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
  solref = jnp.concatenate([r.solref for r in rows])
  solimp = jnp.concatenate([r.solimp for r in rows])
  frictionloss = jnp.concatenate([r.frictionloss for r in rows])

  bias = jnp.concatenate([r.bias for r in rows])
  k, b, imp = _kbi(m, solref, solimp, pos_imp)
  jv = J @ d.qvel
  aref = -b * jv - k * imp * pos - bias
  R = jnp.maximum(math.MINVAL, invweight * (1.0 - imp) / jnp.maximum(math.MINVAL, imp))
  D = 1.0 / R

  return d.replace(
      efc_J=J,
      efc_pos=pos_out,
      efc_margin=margin,
      efc_frictionloss=frictionloss,
      efc_D=D,
      efc_aref=aref,
      efc_force=jnp.zeros(nefc, dtype),
  )
