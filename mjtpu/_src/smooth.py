"""Smooth (unconstrained) dynamics pipeline.

Reference capability map: mujoco_torch/_src/smooth.py (kinematics, com_pos,
crb, factor_m, solve_m, com_vel, rne, tendon, tendon_armature,
transmission).  Semantics follow MuJoCo's mj_kinematics/mj_comPos/mj_crb/
mj_factorM/mj_comVel/mj_rne/mj_tendon/mj_transmission, verified against the
C oracle at float64 in tests/test_smooth.py.

TPU design notes: tree traversals use scan.body_tree (levelwise vmap groups);
the CRBA mass matrix assembles as one (nv,6)x(6,nv) matmul masked by the
static kinematic-chain pattern (MXU-friendly); factorization is dense
Cholesky for one kinematic tree and forest-blocked Cholesky for multi-tree
scenes (`mass_blocks` — the TPU-native answer to the reference's sparse
LDL schedules, SURVEY.md §7 step 9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src import math, scan, sparse, support
from mjtpu._src.types import (
    CamLightType,
    Data,
    DisableBit,
    JointType,
    Model,
    TrnType,
    WrapType,
)


def kinematics(m: Model, d: Data) -> Data:
  """Forward kinematics (mj_kinematics)."""

  # mocap bodies: jointless children of the world whose frame comes from
  # d.mocap_pos/mocap_quat instead of body_pos/body_quat (mj_kinematics;
  # reference smooth.py:105-111).  Substituting before the tree scan gives
  # the exact C override and propagates to any child bodies; the scan's
  # final quat normalize matches C's mju_normalize4 of mocap_quat.
  body_pos, body_quat = m.body_pos, m.body_quat
  if m.nmocap:
    mocap_bodies = np.nonzero(np.asarray(m.body_mocapid) >= 0)[0]
    mocap_ids = np.asarray(m.body_mocapid)[mocap_bodies]
    body_pos = body_pos.at[mocap_bodies].set(
        d.mocap_pos[mocap_ids].astype(body_pos.dtype))
    body_quat = body_quat.at[mocap_bodies].set(
        d.mocap_quat[mocap_ids].astype(body_quat.dtype))

  def fn(carry, jnt_types, jnt_pos, jnt_axis, qpos, qpos0, body_pos, body_quat):
    if carry is None:
      pos, quat = body_pos, body_quat
    else:
      parent_pos, parent_quat, _ = carry
      pos = parent_pos + math.rotate(body_pos, parent_quat)
      quat = math.quat_mul(parent_quat, body_quat)

    anchors, axes = [], []
    qpos_new = qpos
    qi = 0
    for i, jt in enumerate(jnt_types):
      jt = JointType(jt)
      if jt == JointType.FREE:
        anchor = qpos[qi : qi + 3]
        axis = jnp.array([0.0, 0.0, 1.0], dtype=qpos.dtype)
        pos = qpos[qi : qi + 3]
        quat = math.normalize(qpos[qi + 3 : qi + 7])
        qpos_new = qpos_new.at[qi + 3 : qi + 7].set(quat)
        qi += 7
      else:
        anchor = math.rotate(jnt_pos[i], quat) + pos
        axis = math.rotate(jnt_axis[i], quat)
        if jt == JointType.BALL:
          qloc = math.normalize(qpos[qi : qi + 4])
          qpos_new = qpos_new.at[qi : qi + 4].set(qloc)
          quat = math.quat_mul(quat, qloc)
          pos = anchor - math.rotate(jnt_pos[i], quat)
          qi += 4
        elif jt == JointType.HINGE:
          angle = qpos[qi] - qpos0[qi]
          qloc = math.axis_angle_to_quat(jnt_axis[i], angle)
          quat = math.quat_mul(quat, qloc)
          pos = anchor - math.rotate(jnt_pos[i], quat)
          qi += 1
        else:  # SLIDE
          pos = pos + axis * (qpos[qi] - qpos0[qi])
          qi += 1
      anchors.append(anchor)
      axes.append(axis)

    quat = math.normalize(quat)
    xanchor = (
        jnp.stack(anchors) if anchors else jnp.zeros((0, 3), dtype=qpos.dtype)
    )
    xaxis = jnp.stack(axes) if axes else jnp.zeros((0, 3), dtype=qpos.dtype)
    return qpos_new, xanchor, xaxis, pos, quat, math.quat_to_mat(quat)

  qpos, xanchor, xaxis, xpos, xquat, xmat = scan.body_tree(
      m,
      fn,
      "jjjqqbb",
      "qjjbbb",
      np.asarray(m.jnt_type),
      m.jnt_pos,
      m.jnt_axis,
      d.qpos,
      m.qpos0,
      body_pos,
      body_quat,
  )
  if xanchor is None:  # model with no joints
    xanchor = jnp.zeros((m.njnt, 3), dtype=d.qpos.dtype)
    xaxis = jnp.zeros((m.njnt, 3), dtype=d.qpos.dtype)
  if qpos is None:
    qpos = d.qpos

  # inertial / geom / site frames (vectorized gathers)
  v_rot = jax.vmap(math.rotate)
  v_qmul = jax.vmap(math.quat_mul)
  v_q2m = jax.vmap(math.quat_to_mat)

  xipos = xpos + v_rot(m.body_ipos, xquat)
  ximat = v_q2m(v_qmul(xquat, m.body_iquat))

  bid = np.asarray(m.geom_bodyid)
  geom_xpos = xpos[bid] + v_rot(m.geom_pos, xquat[bid])
  geom_xmat = v_q2m(v_qmul(xquat[bid], m.geom_quat))

  sid = np.asarray(m.site_bodyid)
  if m.nsite:
    site_xpos = xpos[sid] + v_rot(m.site_pos, xquat[sid])
    site_xmat = v_q2m(v_qmul(xquat[sid], m.site_quat))
  else:
    site_xpos, site_xmat = d.site_xpos, d.site_xmat

  return d.replace(
      qpos=qpos,
      xanchor=xanchor,
      xaxis=xaxis,
      xpos=xpos,
      xquat=xquat,
      xmat=xmat,
      xipos=xipos,
      ximat=ximat,
      geom_xpos=geom_xpos,
      geom_xmat=geom_xmat,
      site_xpos=site_xpos,
      site_xmat=site_xmat,
  )


def com_pos(m: Model, d: Data) -> Data:
  """Subtree CoM, com-frame inertias (cinert) and dof axes (cdof) — mj_comPos."""

  # subtree mass / mass-weighted com via reverse tree accumulation
  def mass_fn(carry, mass, xipos):
    own = (mass, mass * xipos)
    if carry is None:
      return own
    return own[0] + carry[0], own[1] + carry[1]

  smass, smom = scan.body_tree(
      m, mass_fn, "bb", "bb", m.body_mass, d.xipos, reverse=True
  )
  subtree_com = jax.vmap(lambda mom, ms: mom / jnp.maximum(math.MINVAL, ms))(
      smom, smass
  )

  # cinert: body spatial inertia about the root subtree com
  root_com = subtree_com[np.asarray(m.body_rootid)]
  cinert = jax.vmap(math.transform_inert)(
      m.body_inertia, d.xipos - root_com, d.ximat, m.body_mass
  )
  # world body has no inertia
  cinert = cinert.at[0].set(0.0)

  # cdof: dof motion axes in the com-based frame
  def cdof_fn(jnt_types, xanchor, xaxis, xmat, com):
    dof_com = lambda axis, offset: jnp.concatenate([axis, jnp.cross(axis, offset)])
    cdofs = []
    for i, jt in enumerate(jnt_types):
      jt = JointType(jt)
      offset = com - xanchor[i]
      if jt == JointType.FREE:
        cdofs.append(jnp.eye(3, 6, 3, dtype=xaxis.dtype))  # translation dofs
        cdofs.append(jax.vmap(dof_com, in_axes=(0, None))(xmat.T, offset))
      elif jt == JointType.BALL:
        cdofs.append(jax.vmap(dof_com, in_axes=(0, None))(xmat.T, offset))
      elif jt == JointType.SLIDE:
        cdofs.append(
            jnp.concatenate([jnp.zeros_like(xaxis[i]), xaxis[i]]).reshape(1, 6)
        )
      else:  # HINGE
        cdofs.append(dof_com(xaxis[i], offset).reshape(1, 6))
    if not cdofs:
      return jnp.zeros((0, 6), dtype=xaxis.dtype)
    return jnp.concatenate(cdofs)

  cdof = scan.flat(
      m,
      cdof_fn,
      "jjjbb",
      "v",
      np.asarray(m.jnt_type),
      d.xanchor,
      d.xaxis,
      d.xmat,
      root_com,
  )
  if cdof is None:
    cdof = d.cdof

  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def camlight(m: Model, d: Data) -> Data:
  """Camera/light frames (mj_camlight)."""
  if not m.ncam and not m.nlight:
    return d
  v_rot = jax.vmap(math.rotate)

  if m.ncam:
    bid = np.asarray(m.cam_bodyid)
    cam_xpos = d.xpos[bid] + v_rot(m.cam_pos, d.xquat[bid])
    cam_xmat = jax.vmap(math.quat_to_mat)(
        jax.vmap(math.quat_mul)(d.xquat[bid], m.cam_quat)
    )
    # tracking modes
    for ci in range(m.ncam):
      mode = CamLightType(int(m.cam_mode[ci]))
      if mode == CamLightType.TRACK:
        b = int(m.cam_bodyid[ci])
        cam_xpos = cam_xpos.at[ci].set(d.xpos[b] + m.cam_pos0[ci])
        cam_xmat = cam_xmat.at[ci].set(m.cam_mat0[ci].reshape(3, 3))
      elif mode == CamLightType.TRACKCOM:
        b = int(m.cam_bodyid[ci])
        cam_xpos = cam_xpos.at[ci].set(d.subtree_com[b] + m.cam_poscom0[ci])
        cam_xmat = cam_xmat.at[ci].set(m.cam_mat0[ci].reshape(3, 3))
      elif mode in (CamLightType.TARGETBODY, CamLightType.TARGETBODYCOM):
        tb = int(m.cam_targetbodyid[ci])
        target = (
            d.subtree_com[tb]
            if mode == CamLightType.TARGETBODYCOM
            else d.xpos[tb]
        )
        z = math.normalize(cam_xpos[ci] - target)  # camera looks down -z
        up = jnp.array([0.0, 0.0, 1.0], dtype=z.dtype)
        x = math.normalize(jnp.cross(up, z))
        y = jnp.cross(z, x)
        cam_xmat = cam_xmat.at[ci].set(jnp.stack([x, y, z], axis=1))
    d = d.replace(cam_xpos=cam_xpos, cam_xmat=cam_xmat)

  if m.nlight:
    bid = np.asarray(m.light_bodyid)
    light_xpos = d.xpos[bid] + v_rot(m.light_pos, d.xquat[bid])
    light_xdir = v_rot(m.light_dir, d.xquat[bid])
    for li in range(m.nlight):
      mode = CamLightType(int(m.light_mode[li]))
      b = int(m.light_bodyid[li])
      if mode == CamLightType.TRACK:
        light_xpos = light_xpos.at[li].set(d.xpos[b] + m.light_pos0[li])
      elif mode == CamLightType.TRACKCOM:
        light_xpos = light_xpos.at[li].set(d.subtree_com[b] + m.light_poscom0[li])
      elif mode in (CamLightType.TARGETBODY, CamLightType.TARGETBODYCOM):
        tb = int(m.light_targetbodyid[li])
        target = (
            d.subtree_com[tb]
            if mode == CamLightType.TARGETBODYCOM
            else d.xpos[tb]
        )
        light_xdir = light_xdir.at[li].set(light_xpos[li] - target)
    light_xdir = jax.vmap(math.normalize)(light_xdir)
    d = d.replace(light_xpos=light_xpos, light_xdir=light_xdir)

  return d


@functools.lru_cache(maxsize=64)
def _dof_chain_mask_cached(nv, dof_parentid) -> np.ndarray:
  """(nv, nv) mask: M[i, j] = 1 iff j == i or j is an ancestor dof of i."""
  mask = np.zeros((nv, nv), dtype=np.float64)
  for i in range(nv):
    j = i
    while j >= 0:
      mask[i, j] = 1.0
      j = dof_parentid[j]
  return mask


def dof_chain_mask(m: Model) -> np.ndarray:
  return _dof_chain_mask_cached(m.nv, tuple(int(x) for x in m.dof_parentid))


def chain_pattern(m: Model) -> np.ndarray:
  """(nv, nv) symmetric 0/1 sparsity pattern of MuJoCo's qM: entry (i, j)
  exists iff one of i, j is an ancestor dof of the other (or i == j)."""
  mask = dof_chain_mask(m)
  return np.maximum(mask, mask.T)


@functools.lru_cache(maxsize=64)
def _mass_blocks_cached(nv, dof_tree):
  lo, hi = {}, {}
  for i, t in enumerate(dof_tree):
    lo[t] = min(lo.get(t, i), i)
    hi[t] = max(hi.get(t, i), i)
  intervals = sorted((lo[t], hi[t]) for t in lo)
  # interval hull: components interleaved in dof order merge conservatively
  merged = []
  for s, e in intervals:
    if merged and s <= merged[-1][1]:
      merged[-1] = (merged[-1][0], max(merged[-1][1], e))
    else:
      merged.append((s, e))
  blocks = tuple((s, e - s + 1) for s, e in merged)
  return None if len(blocks) <= 1 else blocks


def mass_blocks(m: Model) -> tuple[tuple[int, int], ...] | None:
  """Static diagonal-block partition ((start, size), ...) of qM, or None
  when one block spans all dofs.

  qM is exactly block diagonal with one block per kinematic tree: MuJoCo's
  chain-sparsity pattern admits no cross-tree entries (tendon armature /
  damping cross terms are pattern-masked out, matching C — see
  tendon_armature).  Factoring per block replaces the O(nv³) dense Cholesky
  with independent small factorizations batched over blocks — the
  TPU-native equivalent of the reference's sparse LDL schedules (reference
  smooth.py:311-354, device.py:763-829; SURVEY.md §7 step 9).  A/B knob:
  MJTPU_MASS_BLOCKS=0 forces the dense path — read at TRACE time (like
  MJTPU_PALLAS_CHOL): flipping it after a function is jitted has no
  effect; use separate jit wrappers for in-process A/Bs."""
  import os

  if m.nv == 0 or os.environ.get("MJTPU_MASS_BLOCKS", "1") == "0":
    return None
  rootid = np.asarray(m.body_rootid)
  dof_tree = tuple(int(rootid[b]) for b in np.asarray(m.dof_bodyid))
  return _mass_blocks_cached(m.nv, dof_tree)


@functools.lru_cache(maxsize=64)
def _block_indices_cached(blocks):
  """Per size group: (rows (k, bs), ii (k, bs, bs), jj (k, bs, bs)) static
  gather/scatter indices — the whole group moves with ONE gather and ONE
  scatter instead of per-block slices (launch overhead killed the naive
  version on TPU)."""
  by: dict[int, list[int]] = {}
  for s, n in blocks:
    by.setdefault(n, []).append(s)
  out = []
  for bs, starts in sorted(by.items()):
    rows = np.asarray([[s + r for r in range(bs)] for s in starts])  # (k, bs)
    ii = np.repeat(rows[:, :, None], bs, axis=2)
    jj = np.repeat(rows[:, None, :], bs, axis=1)
    out.append((bs, rows, ii, jj))
  return out


def _block_indices(blocks):
  return _block_indices_cached(tuple(blocks))


def crb(m: Model, d: Data) -> Data:
  """Composite rigid body inertias + mass matrix (mj_crb)."""

  def crb_fn(carry, cinert):
    return cinert if carry is None else cinert + carry

  crb_body = scan.body_tree(m, crb_fn, "b", "b", d.cinert, reverse=True)
  crb_body = crb_body.at[0].set(0.0)  # world row stays zero (mj_crb)

  # qM[i, j] = cdof[j] . (crb[body(i)] * cdof[i])   for j in chain(i)
  buf = jax.vmap(math.inert_mul)(crb_body[np.asarray(m.dof_bodyid)], d.cdof)
  full = buf @ d.cdof.T  # (nv, nv) — MXU matmul
  mask = jnp.asarray(dof_chain_mask(m), dtype=full.dtype)
  lower = full * mask
  qm = lower + lower.T - jnp.diag(jnp.diag(full))
  qm = qm + jnp.diag(m.dof_armature)
  return d.replace(crb=crb_body, qM=qm)


def factor_m(m: Model, d: Data, M: jax.Array | None = None) -> Data:
  """Mass matrix factorization (mj_factorM).

  Three static paths, picked at trace time: multi-tree scenes factor each
  static mass block independently (`mass_blocks`) — identical results
  (off-block entries of a block-diagonal matrix contribute exact zeros to
  the dense factorization) at a fraction of the flops; big branchy
  single-tree models take the levelwise sparse LDL (sparse.py — the
  mj_factorM zero-fill-in schedule, work Σ depth² instead of nv³/3);
  everything else is one dense Cholesky."""
  M = d.qM if M is None else M
  blocks = mass_blocks(m)
  if blocks is None:
    s = sparse.structure(m)
    if s is not None:
      from mjtpu.ops import fused

      S = fused.ldl_factor(s, M)  # Pallas batched kernel under vmap on TPU
      qLD = sparse.scatter_dense(s, S)
      return d.replace(qLD=qLD, qLDiagInv=1.0 / jnp.diagonal(qLD))
    qLD = math.safe_cholesky(M)
  else:
    qLD = jnp.zeros_like(M)
    for _, _, ii, jj in _block_indices(blocks):
      f = jax.vmap(math.safe_cholesky)(M[ii, jj])
      qLD = qLD.at[ii, jj].set(f)
  qLDiagInv = 1.0 / jnp.diagonal(qLD)
  return d.replace(qLD=qLD, qLDiagInv=qLDiagInv)


def solve_m(m: Model, d: Data, x: jax.Array) -> jax.Array:
  """Solves qM y = x using the current factorization (mj_solveM)."""
  blocks = mass_blocks(m)
  if blocks is None:
    s = sparse.structure(m)
    if s is not None:
      from mjtpu.ops import fused

      S = sparse.gather_compact(s, d.qLD)
      sol = fused.ldl_solve(s, S, x if x.ndim == 1 else x.T)
      return sol if x.ndim == 1 else sol.T
    if x.ndim > 1:
      return math.cho_solve(d.qLD, x.T).T
    return math.cho_solve(d.qLD, x)
  xt = x if x.ndim == 1 else x.T  # (nv,) or (nv, k)
  out = jnp.zeros_like(xt)
  for _, rows, ii, jj in _block_indices(blocks):
    sol = math.cho_solve(d.qLD[ii, jj], xt[rows])
    out = out.at[rows].set(sol)
  return out if x.ndim == 1 else out.T


def factor_solve(
    m: Model, mat: jax.Array, rhs: jax.Array, symmetric: bool = True
) -> jax.Array:
  """One-shot solve mat @ x = rhs respecting the static mass-block pattern.

  Used by the implicit-damping integrators: mat = qM ± h·D keeps qM's block
  structure (diag damping is in-block; tendon damping cross-tree terms are
  chain-pattern-masked everywhere — blocks never merge, matching C's
  sparsity).  symmetric=False takes the LU path (ImplicitFast's
  qM − h·∂qfrc/∂qvel is not symmetric)."""
  blocks = mass_blocks(m)
  if blocks is None:
    if symmetric:
      from mjtpu.ops import fused

      s = sparse.structure(m)
      if s is not None:  # qM ± h·D keeps qM's chain pattern
        return fused.ldl_factor_solve(s, mat, rhs)
      return fused.chol_solve(mat, rhs)
    lu, piv = jax.scipy.linalg.lu_factor(mat)
    return jax.scipy.linalg.lu_solve((lu, piv), rhs)
  out = jnp.zeros_like(rhs)
  for _, rows, ii, jj in _block_indices(blocks):
    subs = mat[ii, jj]
    rs = rhs[rows]
    if symmetric:
      sol = math.cho_solve(jax.vmap(math.safe_cholesky)(subs), rs)
    else:
      sol = jax.vmap(
          lambda A, b: jax.scipy.linalg.lu_solve(
              jax.scipy.linalg.lu_factor(A), b
          )
      )(subs, rs)
    out = out.at[rows].set(sol)
  return out


def dense_m(m: Model, d: Data) -> jax.Array:
  return support.full_m(m, d)


def mul_m(m: Model, d: Data, vec: jax.Array) -> jax.Array:
  return support.mul_m(m, d, vec)


def com_vel(m: Model, d: Data) -> Data:
  """Com-frame velocities + cdof time derivatives (mj_comVel)."""

  def fn(carry, jnt_types, cdof, qvel):
    cvel = jnp.zeros(6, dtype=cdof.dtype) if carry is None else carry
    cross = jax.vmap(math.motion_cross, in_axes=(None, 0))
    cdof_x_qvel = cdof * qvel[:, None]
    cdof_dots = []
    di = 0
    for jt in jnt_types:
      jt = JointType(jt)
      if jt == JointType.FREE:
        cvel = cvel + jnp.sum(cdof_x_qvel[di : di + 3], axis=0)
        cdof_dots.append(jnp.zeros((3, 6), dtype=cdof.dtype))
        cdof_dots.append(cross(cvel, cdof[di + 3 : di + 6]))
        cvel = cvel + jnp.sum(cdof_x_qvel[di + 3 : di + 6], axis=0)
        di += 6
      else:
        w = jt.dof_width()
        cdof_dots.append(cross(cvel, cdof[di : di + w]))
        cvel = cvel + jnp.sum(cdof_x_qvel[di : di + w], axis=0)
        di += w
    cdof_dot = (
        jnp.concatenate(cdof_dots)
        if cdof_dots
        else jnp.zeros((0, 6), dtype=cdof.dtype)
    )
    return cvel, cdof_dot

  cvel, cdof_dot = scan.body_tree(
      m, fn, "jvv", "bv", np.asarray(m.jnt_type), d.cdof, d.qvel
  )
  if cdof_dot is None:
    cdof_dot = d.cdof_dot
  return d.replace(cvel=cvel, cdof_dot=cdof_dot)


def rne(m: Model, d: Data) -> Data:
  """Recursive Newton-Euler bias forces, qacc = 0 (mj_rne)."""
  dtype = d.qpos.dtype

  # forward: com-frame accelerations from gravity + velocity-product terms
  if m.opt.disableflags & DisableBit.GRAVITY:
    base_acc = jnp.zeros(6, dtype=dtype)
  else:
    base_acc = jnp.concatenate([jnp.zeros(3, dtype=dtype), -m.opt.gravity])

  def cacc_fn(carry, cdof_dot, qvel):
    cacc = base_acc if carry is None else carry
    return cacc + cdof_dot.T @ qvel

  cacc = scan.body_tree(m, cacc_fn, "vv", "b", d.cdof_dot, d.qvel)

  # body-local force: I a + v x* (I v)
  def frc_fn(cinert, cacc_, cvel):
    return math.inert_mul(cinert, cacc_) + math.motion_cross_force(
        cvel, math.inert_mul(cinert, cvel)
    )

  loc_frc = jax.vmap(frc_fn)(d.cinert, cacc, d.cvel)

  # reverse: accumulate child forces
  def acc_fn(carry, frc):
    return frc if carry is None else frc + carry

  cfrc = scan.body_tree(m, acc_fn, "b", "b", loc_frc, reverse=True)

  qfrc_bias = jnp.einsum(
      "vk,vk->v", d.cdof, cfrc[np.asarray(m.dof_bodyid)]
  )
  return d.replace(qfrc_bias=qfrc_bias)


def tendon(m: Model, d: Data) -> Data:
  """Tendon lengths and Jacobians (mj_tendon): fixed and spatial.

  Fixed (joint-wrap) tendons are linear in qpos; spatial tendons walk their
  site/geom/pulley chains with exact mju_wrap geometry (tendon_wrap.py).
  The reference supports fixed tendons only (smooth.py:470-497)."""
  if not m.ntendon:
    return d

  from mjtpu._src import tendon_wrap

  wrap_types = np.asarray(m.wrap_type)
  is_jnt = wrap_types == int(WrapType.JOINT)
  ten_length = jnp.zeros(m.ntendon, dtype=d.qpos.dtype)
  ten_J = jnp.zeros((m.ntendon, m.nv), dtype=d.qpos.dtype)

  if np.any(is_jnt):
    jsel = np.nonzero(is_jnt)[0]
    wrap_jnt = np.asarray(m.wrap_objid)[jsel]
    coef = jnp.asarray(np.asarray(m.wrap_prm)[jsel], dtype=d.qpos.dtype)
    qadr = np.asarray(m.jnt_qposadr)[wrap_jnt]
    dadr = np.asarray(m.jnt_dofadr)[wrap_jnt]
    all_ten_id = np.concatenate(
        [np.full(int(n), t) for t, n in enumerate(np.asarray(m.tendon_num))]
    )
    ten_id = all_ten_id[jsel]
    ten_length = ten_length.at[ten_id].add(coef * d.qpos[qadr])
    ten_J = ten_J.at[ten_id, dadr].add(coef)

  if np.any(~is_jnt):
    ten_length, ten_J, wxpos, wactive = tendon_wrap.spatial_tendon(
        m, d, ten_length, ten_J)
    d = d.replace(ten_wrap_xpos=wxpos, ten_wrap_active=wactive)

  return d.replace(ten_length=ten_length, ten_J=ten_J)


def tendon_armature(m: Model, d: Data) -> Data:
  """Adds tendon armature inertia Jᵀ A J to qM (mj 3.9+ semantics).

  Masked to the kinematic-chain sparsity pattern: MuJoCo's sparse qM layout
  cannot represent coupling between dofs that are not tree ancestors, so C
  silently drops those cross terms (oracle-verified: a tendon joining two
  separate trees contributes only diagonal armature to mj_fullM).  Matching
  that keeps qM exactly block-diagonal per kinematic tree (mass_blocks)."""
  if not m.ntendon:
    return d
  JA = d.ten_J * m.tendon_armature[:, None]
  add = d.ten_J.T @ JA
  return d.replace(qM=d.qM + add * jnp.asarray(chain_pattern(m), dtype=add.dtype))


def transmission(m: Model, d: Data) -> Data:
  """Actuator lengths and moment arms (mj_transmission).

  Vectorized per static transmission group; only ball/free joint and site
  transmissions fall back to per-actuator code (rare)."""
  if not m.nu:
    return d
  dtype = d.qpos.dtype

  if m.actuator_static_moment is not None:
    # all-scalar-joint model (ant, humanoid, ...): the moment matrix was
    # baked at put_model time as an XLA constant; only lengths are dynamic.
    # NOTE: gear changes via m.replace(actuator_gear=...) must also pass
    # actuator_static_moment=None (or re-run put_model) — the bake snapshots
    # gear[:, 0] and would otherwise go stale.
    jid = np.asarray(m.actuator_trnid)[:, 0]
    qadr = np.asarray(m.jnt_qposadr)[jid]
    dadr = np.asarray(m.jnt_dofadr)[jid]
    g0 = m.actuator_static_moment[np.arange(m.nu), dadr]
    return d.replace(
        actuator_length=d.qpos[qadr] * jnp.asarray(g0, dtype=dtype),
        actuator_moment=jnp.asarray(m.actuator_static_moment, dtype=dtype),
    )

  length = jnp.zeros(m.nu, dtype=dtype)
  moment = jnp.zeros((m.nu, m.nv), dtype=dtype)

  trntype = np.asarray(m.actuator_trntype)
  trnid = np.asarray(m.actuator_trnid)
  jnt_type = np.asarray(m.jnt_type)

  # --- joint transmission on scalar joints (the common case), batched ---
  is_joint = (trntype == TrnType.JOINT) | (trntype == TrnType.JOINTINPARENT)
  # trnid is a joint index only for joint transmissions; clip before the
  # jnt_type gather so BODY/SITE ids (which can exceed njnt) don't fault
  scalar_jnt = np.isin(
      jnt_type[np.where(is_joint, trnid[:, 0], 0)],
      (int(JointType.SLIDE), int(JointType.HINGE)),
  )
  ids = np.nonzero(is_joint & scalar_jnt)[0]
  if len(ids):
    j = trnid[ids, 0]
    qadr = np.asarray(m.jnt_qposadr)[j]
    dadr = np.asarray(m.jnt_dofadr)[j]
    g0 = m.actuator_gear[ids, 0]
    length = length.at[ids].set(d.qpos[qadr] * g0)
    moment = moment.at[ids, dadr].set(g0)

  # --- tendon transmission, batched ---
  ids = np.nonzero(trntype == TrnType.TENDON)[0]
  if len(ids):
    t = trnid[ids, 0]
    g0 = m.actuator_gear[ids, 0]
    length = length.at[ids].set(d.ten_length[t] * g0)
    moment = moment.at[ids].set(d.ten_J[t] * g0[:, None])

  # --- remaining transmissions (ball/free joints, sites): per actuator ---
  rest = np.nonzero(
      ~(is_joint & scalar_jnt) & (trntype != TrnType.TENDON)
  )[0]
  for u in rest:
    ttype = TrnType(int(trntype[u]))
    gear = m.actuator_gear[u]
    if ttype in (TrnType.JOINT, TrnType.JOINTINPARENT):
      j = int(trnid[u, 0])
      jt = JointType(int(jnt_type[j]))
      qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
      if jt == JointType.BALL:
        q = d.qpos[qadr : qadr + 4]
        axis_angle = math.quat_to_vel(q)
        gearaxis = (
            math.rotate_inv(gear[:3], q)
            if ttype == TrnType.JOINTINPARENT
            else gear[:3]
        )
        length = length.at[u].set(jnp.dot(axis_angle, gear[:3]))
        moment = moment.at[u, dadr : dadr + 3].set(gearaxis)
      else:  # FREE
        q = d.qpos[qadr + 3 : qadr + 7]
        gearaxis = (
            math.rotate_inv(gear[3:], q)
            if ttype == TrnType.JOINTINPARENT
            else gear[3:]
        )
        length = length.at[u].set(0.0)
        moment = moment.at[u, dadr : dadr + 3].set(gear[:3])
        moment = moment.at[u, dadr + 3 : dadr + 6].set(gearaxis)
    elif ttype == TrnType.SITE:
      sid = int(trnid[u, 0])
      refid = int(trnid[u, 1])
      jacp, jacr = support.jac(m, d, d.site_xpos[sid], int(m.site_bodyid[sid]))
      if refid == -1:
        length = length.at[u].set(0.0)
        frame = d.site_xmat[sid]
        moment = moment.at[u].set(
            jacp @ (frame @ gear[:3]) + jacr @ (frame @ gear[3:])
        )
      else:
        jacp2, jacr2 = support.jac(
            m, d, d.site_xpos[refid], int(m.site_bodyid[refid])
        )
        frame = d.site_xmat[refid]
        vecp = frame.T @ (d.site_xpos[sid] - d.site_xpos[refid])
        quat_rel = math.quat_mul(
            math.quat_inv(math.mat_to_quat(d.site_xmat[refid])),
            math.mat_to_quat(d.site_xmat[sid]),
        )
        vecr = math.quat_to_vel(quat_rel)
        length = length.at[u].set(
            jnp.dot(vecp, gear[:3]) + jnp.dot(vecr, gear[3:])
        )
        djacp = (jacp - jacp2) @ frame
        djacr = (jacr - jacr2) @ frame
        moment = moment.at[u].set(djacp @ gear[:3] + djacr @ gear[3:])
    elif ttype == TrnType.SLIDERCRANK:
      # length = gear0 * (a.v - sqrt((a.v)^2 + rod^2 - v.v)) with a the
      # slider site's z axis and v = crank_pos - slider_pos; moment is the
      # analytic dL/dq (chain rule through both site Jacobians and the
      # rotating slider axis).  Oracle-validated vs mj_transmission.
      cid, sid = int(trnid[u, 0]), int(trnid[u, 1])
      rod = m.actuator_cranklength[u]
      axis = d.site_xmat[sid][:, 2]
      vec = d.site_xpos[cid] - d.site_xpos[sid]
      av = jnp.dot(axis, vec)
      sdet = av * av + rod * rod - jnp.dot(vec, vec)
      # rod shorter than the crank offset is a degenerate (unreachable)
      # config; clamp like C's ok=0 branch rather than emit NaN
      det = jnp.sqrt(jnp.maximum(sdet, math.MINVAL))
      length = length.at[u].set(gear[0] * (av - det))
      scale = 1.0 - av / det
      dldv = scale * axis + vec / det
      jacp_c, _ = support.jac(
          m, d, d.site_xpos[cid], int(m.site_bodyid[cid])
      )
      jacp_s, jacr_s = support.jac(
          m, d, d.site_xpos[sid], int(m.site_bodyid[sid])
      )
      mom = (jacp_c - jacp_s) @ dldv + jacr_s @ (
          scale * jnp.cross(axis, vec)
      )
      moment = moment.at[u].set(gear[0] * mom)
    elif ttype == TrnType.BODY:
      # adhesion: length 0; moment = -mean of the normal-direction contact
      # Jacobians over every DETECTED contact (dist < margin, i.e. existing
      # in C's d->contact — gap-zone constraint-inactive contacts included;
      # that is the documented margin+gap adhesion-at-a-distance use case)
      # involving the body's geoms.  gear is ignored (oracle-verified).
      from mjtpu._src import constraint as constraint_mod

      bid = int(trnid[u, 0])
      body_geoms = np.nonzero(np.asarray(m.geom_bodyid) == bid)[0]
      ncon_slots = d.contact.dist.shape[0]
      if len(body_geoms) and ncon_slots:
        jt, _, _ = constraint_mod._contact_jacobians(m, d)
        jn = jt[:, 0, :]  # (ncon, nv) normal rows (geom1 -> geom2)
        bg = jnp.asarray(body_geoms)
        involved = (d.contact.geom1[:, None] == bg[None, :]).any(axis=1) | (
            d.contact.geom2[:, None] == bg[None, :]
        ).any(axis=1)
        detected = d.contact.dist < d.contact.margin
        mask = (involved & detected).astype(dtype)
        count = jnp.sum(mask)
        row = -(mask[:, None] * jn).sum(axis=0) / jnp.maximum(count, 1.0)
        moment = moment.at[u].set(row)
      # length stays 0
    else:
      raise NotImplementedError(f"transmission {ttype}")

  return d.replace(actuator_length=length, actuator_moment=moment)


# ---------------------------------------------------------------------------
# post-constraint quantities (the reference's acc-stage sensors silently read
# stale zeros because these were missing — SURVEY.md §2.4; implemented here)
# ---------------------------------------------------------------------------


def rne_postconstraint(m: Model, d: Data) -> Data:
  """Com-frame accelerations & interaction forces with actual qacc
  (mj_rnePostConstraint): fills cacc, cfrc_int, cfrc_ext."""
  dtype = d.qpos.dtype
  nbody = m.nbody

  # ---- cfrc_ext: applied forces + contact + equality connect/weld ----
  cfrc_ext = jnp.zeros((nbody, 6), dtype=dtype)

  # xfrc_applied: world wrench at xipos -> com-based frame wrench
  def xfrc_to_com(xfrc, xipos, rc):
    # mjData xfrc_applied layout: (force[3], torque[3]); com-frame wrench is
    # (torque[3], force[3]) about the root subtree com
    force, torque = xfrc[:3], xfrc[3:]
    torque = torque + jnp.cross(xipos - rc, force)
    return jnp.concatenate([torque, force])

  root_com = d.subtree_com[np.asarray(m.body_rootid)]
  cfrc_ext = cfrc_ext + jax.vmap(xfrc_to_com)(d.xfrc_applied, d.xipos, root_com)
  cfrc_ext = cfrc_ext.at[0].set(0.0)

  # contact forces
  from mjtpu._src import collision_driver, support as support_mod

  ncon = collision_driver.ncon(m)
  if ncon:
    cfrc, b1, b2 = support_mod.contact_force_com(m, d)
    cfrc_ext = cfrc_ext.at[jnp.asarray(b2)].add(cfrc)
    cfrc_ext = cfrc_ext.at[jnp.asarray(b1)].add(-cfrc)

  # equality connect/weld forces
  ne, _, _, _ = support_mod.count_constraints(m)
  if ne and not (m.opt.disableflags & DisableBit.EQUALITY):
    from mjtpu._src.types import EqType

    row = 0
    for e in range(m.neq):
      etype = int(m.eq_type[e])
      if etype == EqType.CONNECT or etype == EqType.WELD:
        b1e, b2e = int(m.eq_obj1id[e]), int(m.eq_obj2id[e])
        data = m.eq_data[e]
        pos1 = d.xmat[b1e] @ data[0:3] + d.xpos[b1e]
        force = d.efc_force[row : row + 3]  # world-frame force on body1
        if etype == EqType.WELD:
          torque = d.efc_force[row + 3 : row + 6]
          nrow = 6
        else:
          torque = jnp.zeros(3, dtype=dtype)
          nrow = 3
        for sgn, b in ((1.0, b1e), (-1.0, b2e)):
          rc = d.subtree_com[int(m.body_rootid[b])]
          t = sgn * (torque + jnp.cross(pos1 - rc, force))
          f = sgn * force
          cfrc_ext = cfrc_ext.at[b].add(jnp.concatenate([t, f]))
        row += nrow
      elif etype == EqType.JOINT:
        row += 1

  # ---- forward pass: cacc with actual qacc ----
  if m.opt.disableflags & DisableBit.GRAVITY:
    base_acc = jnp.zeros(6, dtype=dtype)
  else:
    base_acc = jnp.concatenate([jnp.zeros(3, dtype=dtype), -m.opt.gravity])

  def cacc_fn(carry, cdof, cdof_dot, qvel, qacc):
    cacc = base_acc if carry is None else carry
    return cacc + cdof_dot.T @ qvel + cdof.T @ qacc

  cacc = scan.body_tree(
      m, cacc_fn, "vvvv", "b", d.cdof, d.cdof_dot, d.qvel, d.qacc
  )

  # ---- backward pass: cfrc_int ----
  def frc_fn(cinert, cacc_, cvel, ext):
    return (
        math.inert_mul(cinert, cacc_)
        + math.motion_cross_force(cvel, math.inert_mul(cinert, cvel))
        - ext
    )

  loc_frc = jax.vmap(frc_fn)(d.cinert, cacc, d.cvel, cfrc_ext)

  def acc_fn(carry, frc):
    return frc if carry is None else frc + carry

  cfrc_int = scan.body_tree(m, acc_fn, "b", "b", loc_frc, reverse=True)

  return d.replace(cacc=cacc, cfrc_int=cfrc_int, cfrc_ext=cfrc_ext)


def subtree_vel(m: Model, d: Data) -> Data:
  """Subtree linear velocity and angular momentum (mj_subtreeVel)."""
  dtype = d.qpos.dtype

  # per-body com-point velocity (world frame, at xipos)
  def body_vel(cvel, xipos, rc):
    ang, lin = cvel[:3], cvel[3:]
    return lin - jnp.cross(xipos - rc, ang), ang

  root_com = d.subtree_com[np.asarray(m.body_rootid)]
  vcom, wbody = jax.vmap(body_vel)(d.cvel, d.xipos, root_com)

  p_body = m.body_mass[:, None] * vcom  # linear momentum
  # body angular momentum about own com: I_world w
  def ang_mom(inertia, ximat, w):
    return ximat @ (inertia * (ximat.T @ w))

  l_body = jax.vmap(ang_mom)(m.body_inertia, d.ximat, wbody)
  # r x p term
  rxp = jnp.cross(d.xipos, p_body)

  def acc3(carry, a, b, c):
    own = (a, b, c)
    if carry is None:
      return own
    return tuple(o + cc for o, cc in zip(own, carry))

  p_sub, l_sub, rxp_sub = scan.body_tree(
      m, acc3, "bbb", "bbb", p_body, l_body, rxp, reverse=True
  )

  # subtree mass (reuse body_subtreemass: static masses)
  mass_sub = m.body_subtreemass
  linvel = p_sub / jnp.maximum(math.MINVAL, mass_sub)[:, None]
  angmom = l_sub + rxp_sub - jnp.cross(d.subtree_com, p_sub)

  return d.replace(subtree_linvel=linvel, subtree_angmom=angmom)


# ---------------------------------------------------------------------------
# energy — capability-plus: the reference has no energy computation at all.
# C semantics oracle-probed: the gravity term is gated on DisableBit.GRAVITY
# and the joint/tendon spring terms on DisableBit.SPRING; kinetic energy is
# unconditional (mj_energyPos / mj_energyVel).
# ---------------------------------------------------------------------------


def potential_energy(m: Model, d: Data) -> jax.Array:
  """Scalar potential energy: gravity + joint springs + tendon springs
  (mj_energyPos)."""
  dtype = d.qpos.dtype
  e = jnp.zeros((), dtype=dtype)

  if not (m.opt.disableflags & DisableBit.GRAVITY):
    e = e - jnp.einsum("b,bi,i->", m.body_mass, d.xipos, m.opt.gravity)

  spring_on = not (m.opt.disableflags & DisableBit.SPRING)
  if m.has_jnt_spring and spring_on:
    jt = np.asarray(m.jnt_type)
    qadr = np.asarray(m.jnt_qposadr)
    k = m.jnt_stiffness

    scalar = np.nonzero(
        (jt == int(JointType.SLIDE)) | (jt == int(JointType.HINGE))
    )[0]
    if len(scalar):
      dif = d.qpos[qadr[scalar]] - m.qpos_spring[qadr[scalar]]
      e = e + 0.5 * jnp.sum(k[scalar] * dif * dif)

    def quat_term(adrs, kk):
      q = d.qpos[adrs[:, None] + np.arange(4)]
      qs = m.qpos_spring[adrs[:, None] + np.arange(4)]
      dif = jax.vmap(math.quat_sub)(q, qs)
      return 0.5 * jnp.sum(kk * jnp.sum(dif * dif, axis=1))

    ball = np.nonzero(jt == int(JointType.BALL))[0]
    if len(ball):
      e = e + quat_term(qadr[ball], k[ball])

    free = np.nonzero(jt == int(JointType.FREE))[0]
    if len(free):
      t = (
          d.qpos[qadr[free][:, None] + np.arange(3)]
          - m.qpos_spring[qadr[free][:, None] + np.arange(3)]
      )
      e = e + 0.5 * jnp.sum(k[free] * jnp.sum(t * t, axis=1))
      e = e + quat_term(qadr[free] + 3, k[free])

  if m.ntendon and m.has_tendon_spring and spring_on:
    lower, upper = m.tendon_lengthspring[:, 0], m.tendon_lengthspring[:, 1]
    disp = jnp.where(
        d.ten_length > upper,
        d.ten_length - upper,
        jnp.where(d.ten_length < lower, d.ten_length - lower, 0.0),
    )
    e = e + 0.5 * jnp.sum(m.tendon_stiffness * disp * disp)

  return e


def kinetic_energy(m: Model, d: Data) -> jax.Array:
  """Scalar kinetic energy 0.5 qvel' M qvel (mj_energyVel)."""
  return 0.5 * jnp.dot(d.qvel, support.mul_m(m, d, d.qvel))


def energy_pos(m: Model, d: Data) -> Data:
  """Writes potential energy into d.energy[0] (mj_energyPos)."""
  return d.replace(energy=d.energy.at[0].set(potential_energy(m, d)))


def energy_vel(m: Model, d: Data) -> Data:
  """Writes kinetic energy into d.energy[1] (mj_energyVel)."""
  return d.replace(energy=d.energy.at[1].set(kinetic_energy(m, d)))
