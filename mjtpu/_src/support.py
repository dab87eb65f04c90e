"""Support functions: constraint counting, Jacobians, mass-matrix utilities,
muscle model.

Reference capability map: mujoco_torch/_src/support.py (jac, full_m,
xfrc_accumulate, muscle), plus the constraint-size computation that lived in
device.py:226-264.  Sizes are pure host functions of the Model's static
fields, evaluated at trace time — nothing is cached on Data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjtpu._src import math
from mjtpu._src.types import (
    ConeType,
    Data,
    DisableBit,
    EqType,
    JointType,
    Model,
)

# ---------------------------------------------------------------------------
# constraint sizes (host, static)
# ---------------------------------------------------------------------------


def tendon_limit_rows_per(m: Model) -> int:
  """Static rows per limited tendon: 2 iff any limited tendon's range is
  narrower than 2*margin (C can then emit both sides at once), else 1."""
  lim = np.asarray(m.tendon_limited).astype(bool)
  if lim.any() and np.asarray(m.tendon_limit_two_sided)[lim].any():
    return 2
  return 1


def count_constraints(m: Model) -> tuple[int, int, int, int]:
  """(ne, nf, nl, nefc) — static row counts (reference device.py:226-264)."""
  if m.opt.disableflags & DisableBit.CONSTRAINT:
    return 0, 0, 0, 0

  if m.opt.disableflags & DisableBit.EQUALITY:
    ne = 0
  else:
    eq = np.asarray(m.eq_type)
    ne = int(
        3 * (eq == EqType.CONNECT).sum()
        + 6 * (eq == EqType.WELD).sum()
        + 1 * (eq == EqType.JOINT).sum()
        + 1 * (eq == EqType.TENDON).sum()
    )

  if m.opt.disableflags & DisableBit.FRICTIONLOSS:
    nf = 0
  else:
    nf = int(len(m.friction_dofid) + len(m.friction_tenid))

  if m.opt.disableflags & DisableBit.LIMIT:
    nl = 0
  else:
    # C materializes one row PER SIDE for scalar joints and tendons, and
    # both sides can be active at once only when the range is narrower
    # than 2*margin — only such joints get two static rows (lower then
    # upper); everything else (incl. ball joints) gets one.  Tendons: two
    # rows each iff ANY limited tendon is two-sided (keeps the tendon
    # block batchable); see constraint._limit_rows.
    from mjtpu._src.types import JointType

    jt = np.asarray(m.jnt_type)
    lim = np.asarray(m.jnt_limited).astype(bool)
    scalar = lim & np.isin(jt, (int(JointType.SLIDE), int(JointType.HINGE)))
    ball = lim & (jt == int(JointType.BALL))
    two = np.asarray(m.jnt_limit_two_sided)
    nt_lim = int(np.asarray(m.tendon_limited).sum())
    ten_rows = (
        2 if tendon_limit_rows_per(m) == 2 else 1
    ) * nt_lim
    nl = int((scalar & two).sum() * 2 + (scalar & ~two).sum() + ball.sum()) + (
        ten_rows
    )

  from mjtpu._src import collision_driver

  ncon_rows = 0
  for condim, count in collision_driver.condim_counts(m).items():
    if m.opt.cone == ConeType.PYRAMIDAL:
      rows = 1 if condim == 1 else (condim - 1) * 2
    else:
      rows = condim
    ncon_rows += rows * count

  return ne, nf, nl, ne + nf + nl + ncon_rows


def constraint_sizes(m: Model) -> tuple[int, int, int, int, int]:
  """(ne, nf, nl, ncon, nefc) — the reference's constraint_sizes tuple."""
  from mjtpu._src import collision_driver

  ne, nf, nl, nefc = count_constraints(m)
  return ne, nf, nl, collision_driver.ncon(m), nefc


_EQ_ROWS = {
    int(EqType.CONNECT): 3,
    int(EqType.WELD): 6,
    int(EqType.JOINT): 1,
    int(EqType.TENDON): 1,
}


def efc_row_meta(m: Model) -> tuple[np.ndarray, np.ndarray]:
  """Static (efc_type, efc_id) labels for every row of the fixed efc layout
  (mjtConstraint values / constraint ids, same order as constraint.py's
  assembly: equality, friction, limits, contacts).  Used by get_data_into
  to reconstruct MjData's efc_type/efc_id (reference device_get_into,
  device.py:1160-1206, gets them for free from torch's dynamic rows)."""
  from mjtpu._src import collision_driver

  ne, nf, nl, nefc = count_constraints(m)
  types = np.zeros(nefc, np.int32)
  ids = np.zeros(nefc, np.int32)
  r = 0

  if ne:
    for e, t in enumerate(np.asarray(m.eq_type)):
      n = _EQ_ROWS[int(t)]
      types[r : r + n] = int(mujoco.mjtConstraint.mjCNSTR_EQUALITY)
      ids[r : r + n] = e
      r += n
  assert r == ne, (r, ne)

  if nf:
    for dof in np.asarray(m.friction_dofid):
      types[r] = int(mujoco.mjtConstraint.mjCNSTR_FRICTION_DOF)
      ids[r] = dof
      r += 1
    for ten in np.asarray(m.friction_tenid):
      types[r] = int(mujoco.mjtConstraint.mjCNSTR_FRICTION_TENDON)
      ids[r] = ten
      r += 1
  assert r == ne + nf, (r, ne, nf)

  if nl:
    jt = np.asarray(m.jnt_type)
    two = np.asarray(m.jnt_limit_two_sided).astype(bool)
    for j in np.nonzero(np.asarray(m.jnt_limited))[0]:
      scalar = jt[j] in (int(JointType.SLIDE), int(JointType.HINGE))
      n = 2 if (scalar and two[j]) else 1
      types[r : r + n] = int(mujoco.mjtConstraint.mjCNSTR_LIMIT_JOINT)
      ids[r : r + n] = j
      r += n
    per = tendon_limit_rows_per(m)
    for ten in np.nonzero(np.asarray(m.tendon_limited))[0]:
      types[r : r + per] = int(mujoco.mjtConstraint.mjCNSTR_LIMIT_TENDON)
      ids[r : r + per] = ten
      r += per
  assert r == ne + nf + nl, (r, ne, nf, nl)

  dims = collision_driver.make_condim(m)
  addr = collision_driver.contact_efc_address(m, ne, nf, nl)
  pyramidal = m.opt.cone == ConeType.PYRAMIDAL
  for c, (a, dim) in enumerate(zip(addr, dims)):
    if dim == 1:
      t, n = int(mujoco.mjtConstraint.mjCNSTR_CONTACT_FRICTIONLESS), 1
    elif pyramidal:
      t, n = int(mujoco.mjtConstraint.mjCNSTR_CONTACT_PYRAMIDAL), 2 * (dim - 1)
    else:
      t, n = int(mujoco.mjtConstraint.mjCNSTR_CONTACT_ELLIPTIC), dim
    types[a : a + n] = t
    ids[a : a + n] = c
  return types, ids


def is_sparse(m: Model) -> bool:
  """Whether the mass matrix uses the sparse (nM,) layout.

  Round-1 build is dense-only; the Pallas batched sparse-LDL path
  (SURVEY.md §7 step 9) flips this for nv >= 60 models.
  """
  return False


# ---------------------------------------------------------------------------
# kinematic-chain masks (host, static)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _dof_ancestor_mask_cached(nbody, nv, parentid, dofadr, dofnum) -> np.ndarray:
  mask = np.zeros((nbody, nv), dtype=np.float64)
  for b in range(nbody):
    anc = b
    while anc > 0:
      da, dn = dofadr[anc], dofnum[anc]
      mask[b, da : da + dn] = 1.0
      anc = parentid[anc]
  return mask


def dof_ancestor_mask(m: Model) -> np.ndarray:
  """(nbody, nv) 0/1 mask: dof i actuates body b's frame (b or an ancestor
  of b owns dof i).  Static — replaces the reference's scan-based mask."""
  return _dof_ancestor_mask_cached(
      m.nbody,
      m.nv,
      tuple(int(x) for x in m.body_parentid),
      tuple(int(x) for x in m.body_dofadr),
      tuple(int(x) for x in m.body_dofnum),
  )


# ---------------------------------------------------------------------------
# Jacobians (device)
# ---------------------------------------------------------------------------


def jac(m: Model, d: Data, point: jax.Array, body_id) -> tuple[jax.Array, jax.Array]:
  """End-effector Jacobian of a world `point` attached to `body_id`.

  Returns (jacp, jacr), each (nv, 3) — reference support.py:138.
  """
  mask_np = dof_ancestor_mask(m)
  if isinstance(body_id, (int, np.integer)):
    mask = jnp.asarray(mask_np[int(body_id)], dtype=d.qpos.dtype)
    root = int(m.body_rootid[body_id])
    offset = point - d.subtree_com[root]
  else:
    mask = jnp.asarray(mask_np, dtype=d.qpos.dtype)[body_id]
    offset = point - d.subtree_com[jnp.asarray(m.body_rootid)[body_id]]
  jacp = (d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], offset[None, :])) * mask[:, None]
  jacr = d.cdof[:, :3] * mask[:, None]
  return jacp, jacr


def jac_dif_pair(m, d, pos, b1, b2):
  """Jacobian difference for a constraint between two bodies at `pos`."""
  jacp2, jacr2 = jac(m, d, pos, b2)
  jacp1, jacr1 = jac(m, d, pos, b1)
  return jacp2 - jacp1, jacr2 - jacr1


def apply_ft(
    m: Model,
    d: Data,
    force: jax.Array,
    torque: jax.Array,
    point: jax.Array,
    body_id,
) -> jax.Array:
  """Maps a world-frame force/torque at `point` on `body_id` to qfrc (nv,)."""
  jacp, jacr = jac(m, d, point, body_id)
  return jacp @ force + jacr @ torque


def xfrc_accumulate(m: Model, d: Data) -> jax.Array:
  """Accumulates d.xfrc_applied over all bodies into qfrc (nv,).

  Fully vectorized over (nbody, nv) with the static ancestor mask — no scan,
  one fused einsum pair (reference looped vmap(jac), forward.py:222-228).
  """
  mask = jnp.asarray(dof_ancestor_mask(m), dtype=d.qpos.dtype)  # (nbody, nv)
  offset = d.xipos - d.subtree_com[jnp.asarray(m.body_rootid)]  # (nbody, 3)
  # jacp[b, v, :] = cdof[v, 3:] + cdof[v, :3] x offset[b]
  jacp = d.cdof[None, :, 3:] + jnp.cross(
      d.cdof[None, :, :3], offset[:, None, :]
  )  # (nbody, nv, 3)
  qfrc_p = jnp.einsum("bv,bvi,bi->v", mask, jacp, d.xfrc_applied[:, :3])
  qfrc_r = jnp.einsum("bv,vi,bi->v", mask, d.cdof[:, :3], d.xfrc_applied[:, 3:])
  return qfrc_p + qfrc_r


# ---------------------------------------------------------------------------
# mass matrix utilities (dense path)
# ---------------------------------------------------------------------------


def full_m(m: Model, d: Data) -> jax.Array:
  """Dense (nv, nv) mass matrix."""
  return d.qM


def mul_m(m: Model, d: Data, vec: jax.Array) -> jax.Array:
  """qM @ vec."""
  return d.qM @ vec


# ---------------------------------------------------------------------------
# muscle model (mju_muscle*)
# ---------------------------------------------------------------------------


def muscle_gain_length(length, lmin, lmax):
  """Active force-length curve (piecewise quadratic bump, mju_muscleGainLength)."""
  a = 0.5 * (lmin + 1.0)
  b = 0.5 * (1.0 + lmax)
  out = jnp.where(
      length <= a,
      0.5 * ((length - lmin) / jnp.maximum(math.MINVAL, a - lmin)) ** 2,
      1.0 - 0.5 * ((1.0 - length) / jnp.maximum(math.MINVAL, 1.0 - a)) ** 2,
  )
  out = jnp.where(
      length > 1.0,
      jnp.where(
          length <= b,
          1.0 - 0.5 * ((length - 1.0) / jnp.maximum(math.MINVAL, b - 1.0)) ** 2,
          0.5 * ((lmax - length) / jnp.maximum(math.MINVAL, lmax - b)) ** 2,
      ),
      out,
  )
  return jnp.where((length <= lmin) | (length >= lmax), 0.0, out)


def _muscle_normalized(len_, lengthrange, prm):
  range0, range1 = prm[0], prm[1]
  l0 = (lengthrange[1] - lengthrange[0]) / jnp.maximum(math.MINVAL, range1 - range0)
  ln = range0 + (len_ - lengthrange[0]) / jnp.maximum(math.MINVAL, l0)
  return ln, l0


def muscle_gain(len_, vel, lengthrange, acc0, prm):
  """Muscle active gain (mju_muscleGain).  prm = (range0, range1, force,
  scale, lmin, lmax, vmax, fpmax, fvmax)."""
  force, scale = prm[2], prm[3]
  lmin, lmax, vmax, fvmax = prm[4], prm[5], prm[6], prm[8]
  ln, l0 = _muscle_normalized(len_, lengthrange, prm)
  v = vel / jnp.maximum(math.MINVAL, l0 * vmax)
  fl = muscle_gain_length(ln, lmin, lmax)
  y = fvmax - 1.0
  fv = jnp.where(
      v <= 0.0,
      (v + 1.0) * (v + 1.0),
      fvmax - ((y - v) * (y - v)) / jnp.maximum(math.MINVAL, y),
  )
  fv = jnp.where(v <= -1.0, 0.0, jnp.where(v > y, fvmax, fv))
  force = jnp.where(force < 0.0, scale / jnp.maximum(math.MINVAL, acc0), force)
  return -force * fl * fv


def muscle_bias(len_, lengthrange, acc0, prm):
  """Muscle passive bias force (mju_muscleBias)."""
  force, scale = prm[2], prm[3]
  lmax, fpmax = prm[5], prm[7]
  ln, _ = _muscle_normalized(len_, lengthrange, prm)
  b = 0.5 * (1.0 + lmax)
  x = (ln - 1.0) / jnp.maximum(math.MINVAL, b - 1.0)
  # quadratic ramp to fpmax/2 at x=1, then linear (oracle-calibrated vs
  # mju_muscleBias)
  fp = jnp.where(
      x <= 1.0,
      0.5 * fpmax * x * x,
      fpmax * (0.5 + (x - 1.0)),
  )
  fp = jnp.where(x <= 0.0, 0.0, fp)
  force = jnp.where(force < 0.0, scale / jnp.maximum(math.MINVAL, acc0), force)
  return -force * fp


def sigmoid(x):
  """Smootherstep sigmoid on [0, 1] (mju_sigmoid)."""
  s = x * x * x * (3.0 * x * (2.0 * x - 5.0) + 10.0)
  return jnp.clip(jnp.where(x <= 0.0, 0.0, jnp.where(x >= 1.0, 1.0, s)), 0.0, 1.0)


def muscle_dynamics(ctrl, act, prm):
  """Muscle activation dynamics (mju_muscleDynamics).  prm = (tau_act,
  tau_deact, smoothing_width)."""
  ctrlclamp = jnp.clip(ctrl, 0.0, 1.0)
  actclamp = jnp.clip(act, 0.0, 1.0)
  tau_act = prm[0] * (0.5 + 1.5 * actclamp)
  tau_deact = prm[1] / (0.5 + 1.5 * actclamp)
  dctrl = ctrlclamp - act
  # smoothing between deactivation and activation time constants
  width = prm[2]
  hard = jnp.where(dctrl > 0.0, tau_act, tau_deact)
  soft = tau_deact + (tau_act - tau_deact) * sigmoid(
      dctrl / jnp.maximum(math.MINVAL, width) + 0.5
  )
  tau = jnp.where(width < math.MINVAL, hard, soft)
  return dctrl / jnp.maximum(math.MINVAL, tau)


# ---------------------------------------------------------------------------
# contact force decoding (mju_decodePyramid / mj_contactForce)
# ---------------------------------------------------------------------------


def contact_forces(m: Model, d: Data) -> jax.Array:
  """(ncon, 6) contact wrenches in the contact frame [fn, ft1, ft2, torques].

  Decodes efc_force per cone type (mju_decodePyramid for pyramidal)."""
  from mjtpu._src import collision_driver

  ncon = collision_driver.ncon(m)
  dtype = d.qpos.dtype
  if ncon == 0:
    return jnp.zeros((0, 6), dtype=dtype)

  ne, nf, nl, _ = count_constraints(m)
  dims = collision_driver.make_condim(m)
  addrs = collision_driver.contact_efc_address(m, ne, nf, nl)
  pyramidal = m.opt.cone == ConeType.PYRAMIDAL

  out = []
  for c in range(ncon):
    dim, adr = int(dims[c]), int(addrs[c])
    f6 = jnp.zeros(6, dtype=dtype)
    if dim == 1:
      f6 = f6.at[0].set(d.efc_force[adr])
    elif pyramidal:
      rows = d.efc_force[adr : adr + 2 * (dim - 1)]
      f6 = f6.at[0].set(jnp.sum(rows))
      mu = d.contact.friction[c]
      for k in range(dim - 1):
        f6 = f6.at[1 + k].set((rows[2 * k] - rows[2 * k + 1]) * mu[k])
    else:
      f6 = f6.at[:dim].set(d.efc_force[adr : adr + dim])
    out.append(f6)
  return jnp.stack(out)


def contact_force_com(m: Model, d: Data):
  """Per-contact com-based world wrenches for cfrc_ext accumulation.

  Returns (wrench (ncon, 6) about body2's root subtree com with world axes,
  body1 ids, body2 ids).  The wrench applies positively to body2 and
  negatively to body1 (mj_rnePostConstraint contact handling)."""
  bodyid = jnp.asarray(np.asarray(m.geom_bodyid))
  rootid = jnp.asarray(np.asarray(m.body_rootid))
  b1 = bodyid[d.contact.geom1]
  b2 = bodyid[d.contact.geom2]

  f_con = contact_forces(m, d)  # contact frame

  def to_com(f6, frame, pos, rc):
    force = frame.T @ f6[:3]   # world force (frame rows are axes)
    torque = frame.T @ f6[3:]
    torque = torque + jnp.cross(pos - rc, force)
    return jnp.concatenate([torque, force])

  rc2 = d.subtree_com[rootid[b2]]
  wrench = jax.vmap(to_com)(f_con, d.contact.frame, d.contact.pos, rc2)
  return wrench, b1, b2


def geom_distance(m: Model, d: Data, g1: int, g2: int, distmax: float):
  """Smallest signed distance between two geoms (mj_geomDistance).

  Returns (dist, fromto): dist is the signed surface distance, clamped to
  ``distmax`` when no separation below distmax is found (C semantics);
  fromto is the (6,) segment between the nearest surface points (zeros when
  nothing is found).  Dispatches through the same registered narrowphase
  colliders as the collision driver; pairs outside the support table raise
  NotImplementedError at trace time."""
  from mjtpu._src import collision_driver

  g1, g2 = int(g1), int(g2)
  t1, t2 = int(m.geom_type[g1]), int(m.geom_type[g2])
  swap = t1 > t2
  if swap:
    g1, g2, t1, t2 = g2, g1, t2, t1
  if not collision_driver.has_collision_fn(t1, t2):
    raise NotImplementedError(
        f"geom_distance between {t1} and {t2} is not supported"
    )
  key = (
      t1, t2,
      collision_driver._shape_key(m, g1),
      collision_driver._shape_key(m, g2),
      3,
  )
  fn = collision_driver._collision_fn(m, key, [(g1, g2, -1)])
  dist, pos, frame = fn(
      d.geom_xpos[g1], d.geom_xmat[g1], m.geom_size[g1],
      d.geom_xpos[g2], d.geom_xmat[g2], m.geom_size[g2],
  )
  i = jnp.argmin(dist)
  dmin, p, n = dist[i], pos[i], frame[i, 0]
  if swap:
    n = -n  # frame normal points swapped-g1 -> swapped-g2; restore caller order
  found = dmin < distmax
  frm = p - 0.5 * dmin * n
  to = p + 0.5 * dmin * n
  fromto = jnp.where(found, jnp.concatenate([frm, to]), 0.0)
  return jnp.where(found, dmin, jnp.asarray(distmax, dmin.dtype)), fromto
