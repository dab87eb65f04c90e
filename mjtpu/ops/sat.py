"""Pallas TPU kernel: batched convex-convex SAT separation winners.

The BASELINE north-star names the collision narrowphase as a padded,
shape-static Pallas kernel family; this is the convex/convex member
(reference workload: mujoco_torch/_src/collision_convex.py:330-601, whose
torch path materializes the (ne1*ne2, nv) projection tensors in HBM per
pair).  The FLOP- and bytes-dominant stage of SAT is axis enumeration +
separations: face axes (nf·nv projections per hull) and the ne1×ne2
edge-cross axes with min/max projections over both vertex sets.  This
kernel fuses that whole stage in one VMEM residency per batch tile and
returns only the *winners* — best face index/separation per hull and the
supporting edge pair + separation — so the O(ne²·nv) intermediates never
touch HBM.  Manifold clipping (gather-shaped, tiny) stays in XLA
(collision_convex.convex_convex).

Layout: batch rides the LANE dimension (like ops/cholesky.py): every SAT
scalar is a (128,)-lane vector over pair instances, every per-face /
per-edge tensor is (nf|ne, B) with faces/edges in sublanes, and the
edge-cross tensors are (ne1, ne2, B).  Hull tables ride along as
grid-invariant VMEM operands.

Tie semantics match the jnp path exactly: argmax picks the lowest index,
and the two-stage (row-max then row) argmax used here is lexicographic in
(e1, e2) — the same order as the jnp path's argmax over the flattened
(ne1*ne2) axis.

Gate: custom_vmap seam in collision_convex._sat_winners; knob
MJTPU_PALLAS_SAT={auto,1,0}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_B = 128


def _hull_tables(hull, np_dtype):
  """Static numpy tables the kernel needs from one ConvexMesh."""
  vert = np.asarray(hull.vert, np_dtype)
  edge = np.asarray(hull.edge)
  face = np.asarray(hull.face)
  return (
      vert,                                            # (nv, 3)
      np.asarray(hull.face_normal, np_dtype),          # (nf, 3)
      vert[face[:, 0]],                                # (nf, 3)
      vert[edge[:, 1]] - vert[edge[:, 0]],             # (ne, 3) edge dirs
      0.5 * (vert[edge[:, 0]] + vert[edge[:, 1]]),     # (ne, 3) midpoints
      vert.mean(axis=0, keepdims=True),                # (1, 3) centroid
  )


def sat_vmem_bytes(hull1, hull2, dtype_bytes: int = 4) -> int:
  """Rough live-set estimate for the (ne1, ne2, B) stage of one tile."""
  ne1, ne2 = len(hull1.edge), len(hull2.edge)
  nv = max(len(hull1.vert), len(hull2.vert))
  nf = max(len(hull1.face), len(hull2.face))
  big = ne1 * ne2 * _TILE_B * dtype_bytes
  small = (nv * 6 + nf * 4 + (ne1 + ne2) * 6) * _TILE_B * dtype_bytes
  return 8 * big + small  # axes xyz + norm + sep + compat/score + 2 accum


def _sat_kernel(pos1_ref, r1_ref, pos2_ref, r2_ref,
                v1_ref, fn1_ref, fv01_ref, ed1_ref, em1_ref, vb1_ref,
                v2_ref, fn2_ref, fv02_ref, ed2_ref, em2_ref, vb2_ref,
                seps_ref, idx_ref):
  """One grid step: all SAT separations for a TILE_B lane-batch of pairs.

  pos (3, B); r (9, B) row-major flattened rotation; tables (n, 3)
  grid-invariant.  Outputs: seps (4, B) float [sep1_best, sep2_best,
  best_edge_sep, 0], idx (4, B) int32 [bf1, bf2, be1, be2] (edge pair
  post support-reselect)."""
  dtype = pos1_ref.dtype
  pos1, r1 = pos1_ref[:], r1_ref[:]
  pos2, r2 = pos2_ref[:], r2_ref[:]

  def rot(r, tbl):
    """World-rotate local vectors: tbl (n, 3) -> [x, y, z] each (n, B)."""
    cols = [tbl[:, k:k + 1] for k in range(3)]        # (n, 1)
    return [cols[0] * r[3 * d + 0][None, :]
            + cols[1] * r[3 * d + 1][None, :]
            + cols[2] * r[3 * d + 2][None, :] for d in range(3)]

  def rot_t(r, p, tbl):
    w = rot(r, tbl)
    return [w[d] + p[d][None, :] for d in range(3)]

  w1 = rot_t(r1, pos1, v1_ref[:])
  w2 = rot_t(r2, pos2, v2_ref[:])

  def face_sep(nrm_l, fv0_l, r_self, p_self, w_other):
    """max-over-faces of (min-over-other-verts of n.v - off): winner only."""
    n_w = rot(r_self, nrm_l)                          # 3 x (nf, B)
    fv0 = rot_t(r_self, p_self, fv0_l)                # 3 x (nf, B)
    off = n_w[0] * fv0[0] + n_w[1] * fv0[1] + n_w[2] * fv0[2]
    minp = None
    for v in range(w_other[0].shape[0]):
      p = (n_w[0] * w_other[0][v][None, :]
           + n_w[1] * w_other[1][v][None, :]
           + n_w[2] * w_other[2][v][None, :])
      minp = p if minp is None else jnp.minimum(minp, p)
    sep = minp - off                                  # (nf, B)
    return jnp.max(sep, axis=0), jnp.argmax(sep, axis=0).astype(jnp.int32)

  sep1b, bf1 = face_sep(fn1_ref[:], fv01_ref[:], r1, pos1, w2)
  sep2b, bf2 = face_sep(fn2_ref[:], fv02_ref[:], r2, pos2, w1)

  # centroids (orientation heuristic; mean commutes with the affine map,
  # so this equals the jnp path's mean of world verts)
  c1 = rot_t(r1, pos1, vb1_ref[:])                    # 3 x (1, B)
  c2 = rot_t(r2, pos2, vb2_ref[:])
  cvec = [c2[d][0] - c1[d][0] for d in range(3)]      # 3 x (B,)

  # --- edge-cross axes ---
  d1 = rot(r1, ed1_ref[:])                            # 3 x (ne1, B)
  d2 = rot(r2, ed2_ref[:])                            # 3 x (ne2, B)

  def outer(a, b):                   # (ne1, B), (ne2, B) -> (ne1, ne2, B)
    return a[:, None, :] * b[None, :, :]

  axx = outer(d1[1], d2[2]) - outer(d1[2], d2[1])
  axy = outer(d1[2], d2[0]) - outer(d1[0], d2[2])
  axz = outer(d1[0], d2[1]) - outer(d1[1], d2[0])
  ax_n = jnp.sqrt(axx * axx + axy * axy + axz * axz)
  inv = 1.0 / jnp.maximum(1e-12, ax_n)
  axx, axy, axz = axx * inv, axy * inv, axz * inv
  orient = (axx * cvec[0][None, None, :] + axy * cvec[1][None, None, :]
            + axz * cvec[2][None, None, :])
  sgn = jnp.sign(orient)
  axx, axy, axz = axx * sgn, axy * sgn, axz * sgn

  maxp1 = None
  for v in range(w1[0].shape[0]):
    p = (axx * w1[0][v][None, None, :] + axy * w1[1][v][None, None, :]
         + axz * w1[2][v][None, None, :])
    maxp1 = p if maxp1 is None else jnp.maximum(maxp1, p)
  minp2 = None
  for v in range(w2[0].shape[0]):
    p = (axx * w2[0][v][None, None, :] + axy * w2[1][v][None, None, :]
         + axz * w2[2][v][None, None, :])
    minp2 = p if minp2 is None else jnp.minimum(minp2, p)
  sep_e = minp2 - maxp1                               # (ne1, ne2, B)
  valid = ax_n >= 1e-6
  neg_inf = jnp.asarray(-jnp.inf, dtype)
  sep_e = jnp.where(valid, sep_e, neg_inf)

  # flat argmax == lexicographic two-stage argmax (lowest index on ties)
  ne1, ne2 = sep_e.shape[0], sep_e.shape[1]
  row_max = jnp.max(sep_e, axis=1)                    # (ne1, B)
  be1 = jnp.argmax(row_max, axis=0).astype(jnp.int32)  # (B,)
  best_edge_sep = jnp.max(row_max, axis=0)            # (B,)
  rows1 = jax.lax.broadcasted_iota(jnp.int32, (ne1, 1), 0)
  oh1b = rows1 == be1[None, :]                        # (ne1, B) bool
  # where-select, NOT multiply: sep_e holds -inf sentinels and -inf*0=NaN
  sep_row = jnp.sum(
      jnp.where(oh1b[:, None, :], sep_e, jnp.zeros_like(sep_e)), axis=0)
  be2 = jnp.argmax(sep_row, axis=0).astype(jnp.int32)  # (ne2, B) -> (B,)

  # winning axis, gathered by one-hot (axes are finite: multiply is safe)
  rows2 = jax.lax.broadcasted_iota(jnp.int32, (ne2, 1), 0)
  oh2 = (rows2 == be2[None, :]).astype(dtype)         # (ne2, B)
  oh1 = oh1b.astype(dtype)
  ohb = oh1[:, None, :] * oh2[None, :, :]             # (ne1, ne2, B)
  abx = jnp.sum(axx * ohb, axis=(0, 1))               # (B,)
  aby = jnp.sum(axy * ohb, axis=(0, 1))
  abz = jnp.sum(axz * ohb, axis=(0, 1))

  # support reselect among (near-)parallel-axis edge pairs (jnp path
  # collision_convex._sat_winners_jnp): same compat test, same -inf mask
  compat = (axx * abx[None, None, :] + axy * aby[None, None, :]
            + axz * abz[None, None, :]) > 1.0 - 1e-6
  compat = compat & valid
  m1 = rot_t(r1, pos1, em1_ref[:])                    # 3 x (ne1, B)
  m2 = rot_t(r2, pos2, em2_ref[:])
  m1s = m1[0] * abx[None, :] + m1[1] * aby[None, :] + m1[2] * abz[None, :]
  m2s = m2[0] * abx[None, :] + m2[1] * aby[None, :] + m2[2] * abz[None, :]
  score = m1s[:, None, :] - m2s[None, :, :]           # (ne1, ne2, B)
  score = jnp.where(compat, score, neg_inf)
  srow_max = jnp.max(score, axis=1)                   # (ne1, B)
  bp1 = jnp.argmax(srow_max, axis=0).astype(jnp.int32)
  ohp1b = rows1 == bp1[None, :]
  # where-select again: score holds -inf for incompatible pairs
  srow = jnp.sum(
      jnp.where(ohp1b[:, None, :], score, jnp.zeros_like(score)), axis=0)
  bp2 = jnp.argmax(srow, axis=0).astype(jnp.int32)

  seps_ref[0, :] = sep1b
  seps_ref[1, :] = sep2b
  seps_ref[2, :] = best_edge_sep
  seps_ref[3, :] = jnp.zeros_like(sep1b)
  idx_ref[0, :] = bf1
  idx_ref[1, :] = bf2
  idx_ref[2, :] = bp1
  idx_ref[3, :] = bp2


def sat_winners_batch(pos1, mat1, pos2, mat2, hull1, hull2,
                      interpret: bool = False):
  """Batched SAT winners: pos (n, 3), mat (n, 3, 3) -> (seps (n, 3),
  idx (n, 4) int32) where seps = [sep1_best, sep2_best, best_edge_sep]
  and idx = [bf1, bf2, be1, be2] (edges post support-reselect)."""
  n = pos1.shape[0]
  dtype = pos1.dtype
  np_dtype = np.dtype(dtype.name if hasattr(dtype, "name") else dtype)
  t1 = [jnp.asarray(t) for t in _hull_tables(hull1, np_dtype)]
  t2 = [jnp.asarray(t) for t in _hull_tables(hull2, np_dtype)]

  pad = (-n) % _TILE_B
  if pad:
    padp = lambda x: jnp.concatenate(
        [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])])
    pos1, mat1, pos2, mat2 = map(padp, (pos1, mat1, pos2, mat2))
  nt = pos1.shape[0]

  # lanes-last layout
  p1 = pos1.T                                         # (3, N)
  p2 = pos2.T
  r1 = mat1.reshape(nt, 9).T                          # (9, N) row-major
  r2 = mat2.reshape(nt, 9).T

  lane_spec = lambda rows: pl.BlockSpec(
      (rows, _TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM)
  tbl_spec = lambda t: pl.BlockSpec(
      t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

  grid = (nt // _TILE_B,)
  seps, idx = pl.pallas_call(
      _sat_kernel,
      out_shape=(
          jax.ShapeDtypeStruct((4, nt), dtype),
          jax.ShapeDtypeStruct((4, nt), jnp.int32),
      ),
      grid=grid,
      in_specs=[lane_spec(3), lane_spec(9), lane_spec(3), lane_spec(9)]
      + [tbl_spec(t) for t in t1] + [tbl_spec(t) for t in t2],
      out_specs=(lane_spec(4), lane_spec(4)),
      interpret=interpret,
  )(p1, r1, p2, r2, *t1, *t2)
  return seps.T[:n, :3], idx.T[:n]
