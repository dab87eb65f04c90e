"""Convex narrowphase collisions (plane/sphere/capsule/convex vs convex hull).

Reference capability map: mujoco_torch/_src/collision_convex.py (plane/convex
top-4 deepest verts :604-623, sphere/convex closest-face point :626-699,
capsule/convex segment clipping :702-802, convex/convex SAT with edge axes +
face manifold clipping :330-601).

TPU design: hull combinatorics (vertex/face/edge tables) are trace-time
constants closed over per candidate group (hulls with identical shape share
one vmapped kernel); all clipping uses fixed-size masked buffers so shapes
are static.  Functions take world poses/sizes and return
(dist (n,), pos (n,3), frame (n,3,3)), normal from geom1 into geom2.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src import math
from mjtpu._src.diff_config import get_diff_config
from mjtpu._src.types import ConvexMesh

# small preference for face axes over edge axes (numerical-tie stability)
_EDGE_TOL = 1e-10


def _smooth_k():
  """Sigmoid sharpness for case blending, or None outside diff mode.

  Read at trace time: the reference's smooth_collisions sigmoid-blended
  case switches (diff_config.py:43-134); a model traced inside
  ``differentiable_mode(smooth_collisions=True)`` blends discrete SAT
  case switches (face/edge winner, inside/outside) so contact dist,
  normal and position stay differentiable across the transition.
  Contact-slot activation (manifold point count) stays discrete; CFD's
  soft activation covers appearing/vanishing contacts.
  """
  dc = get_diff_config()
  if dc is not None and dc.smooth_collisions:
    return dc.smooth_sharpness
  return None


def _blend(k, s, a, b):
  """where(s > 0, a, b), sigmoid-blended when smoothing is active."""
  if k is None:
    return jnp.where(s > 0, a, b)
  return math.sigmoid_blend(s, a, b, k)


def _renorm(n):
  return n / jnp.maximum(1e-12, math.safe_norm(n))


def _hull_consts(hull: ConvexMesh, dtype):
  vert = jnp.asarray(hull.vert, dtype=dtype)
  face_vert = jnp.asarray(hull.vert[hull.face], dtype=dtype)  # (nf, mfv, 3)
  face_normal = jnp.asarray(hull.face_normal, dtype=dtype)
  edge_v = jnp.asarray(hull.vert[hull.edge], dtype=dtype)  # (ne, 2, 3)
  return vert, face_vert, face_normal, edge_v


def plane_convex(pos1, mat1, size1, pos2, mat2, size2, hull2: ConvexMesh):
  """Plane vs convex hull: contacts at the 4 deepest vertices."""
  dtype = pos1.dtype
  n = mat1[:, 2]
  vert = pos2 + jnp.asarray(hull2.vert, dtype=dtype) @ mat2.T  # (nv, 3)
  support = (vert - pos1) @ n  # signed height above plane
  # 4 lowest (deepest) vertices
  idx = jnp.argsort(support)[:4]
  dist = support[idx]
  pos = vert[idx] - 0.5 * dist[:, None] * n[None, :]
  frame = jnp.broadcast_to(math.make_frame(n), (4, 3, 3))
  return dist, pos, frame


def _closest_on_face(face_verts, n, p):
  """Closest point to p on the polygon (face_verts (mfv,3), normal n).

  p is assumed on (or near) the face plane."""
  mfv = face_verts.shape[0]
  a = face_verts
  b = jnp.roll(face_verts, -1, axis=0)
  t = b - a
  # interior is to the left of each CCW edge: outside if (p-a)·(t x n) > 0
  edge_out = jnp.cross(t, jnp.broadcast_to(n, t.shape))
  outside = jnp.einsum("kd,kd->k", p[None, :] - a, edge_out) > 0
  inside_all = ~jnp.any(outside)
  # closest point on each edge segment
  seg_pts = jax.vmap(math.closest_segment_point, in_axes=(0, 0, None))(a, b, p)
  d2 = jnp.sum((seg_pts - p[None, :]) ** 2, axis=1)
  best = seg_pts[jnp.argmin(d2)]
  k = _smooth_k()
  if k is None:
    return jnp.where(inside_all, p, best)
  # signed outside margin in length units (>0 outside any side plane)
  e_hat = edge_out / jnp.maximum(1e-12, math.safe_norm(edge_out, axis=1))[:, None]
  margin = jnp.max(jnp.einsum("kd,kd->k", p[None, :] - a, e_hat))
  return math.sigmoid_blend(-margin, p, best, k)


def sphere_convex(pos1, mat1, size1, pos2, mat2, size2, hull2: ConvexMesh):
  """Sphere vs convex hull (closest face/edge point)."""
  dtype = pos1.dtype
  r = size1[0]
  _, face_vert, face_normal, _ = _hull_consts(hull2, dtype)

  c = mat2.T @ (pos1 - pos2)  # sphere center in hull frame

  # deepest face: max signed distance of c over face planes
  d_f = jnp.einsum("fd,fd->f", face_normal, c[None, :] - face_vert[:, 0])
  f = jnp.argmax(d_f)
  k0 = _smooth_k()
  if k0 is None:
    sep = d_f[f]
    nf = face_normal[f]
  else:
    # soft face-max: the hard argmax kinks at face ties (box edges/corners);
    # softmax weights keep sep and the face normal smooth across them
    w = jax.nn.softmax(k0 * d_f)
    sep = jnp.dot(w, d_f)
    nf = _renorm(w @ face_normal)
  inside = sep < 0

  # closest point on that face's polygon to the projected center
  p_plane = c - sep * nf
  closest = _closest_on_face(face_vert[f], nf, p_plane)

  to_closest = closest - c
  dir_out, dist_c = math.normalize_with_norm(to_closest)
  # outside: normal sphere->hull along to_closest; inside: push out along -nf
  k = _smooth_k()
  if k is None:
    n_local = jnp.where(inside, nf, dir_out)
    dist = jnp.where(inside, sep, dist_c) - r
  else:
    n_local = _renorm(math.sigmoid_blend(-sep, nf, dir_out, k))
    dist = math.sigmoid_blend(-sep, sep, dist_c, k) - r

  n_world = mat2 @ n_local
  pos = pos1 + n_world * (r + 0.5 * dist)
  return dist[None], pos[None], math.make_frame(n_world)[None]


def capsule_convex(pos1, mat1, size1, pos2, mat2, size2, hull2: ConvexMesh):
  """Capsule vs convex hull: full SAT (face normals + edge x segment cross
  axes), face manifold via segment clipping (2 pts) or edge contact."""
  dtype = pos1.dtype
  r, h = size1[0], size1[1]
  vert, face_vert, face_normal, edge_v = _hull_consts(hull2, dtype)

  # capsule segment in hull local frame
  axis_l = mat2.T @ mat1[:, 2]
  cen = mat2.T @ (pos1 - pos2)
  a = cen - h * axis_l
  b = cen + h * axis_l

  # --- face axes: separation of the segment beyond each face plane ---
  da = jnp.einsum("fd,fd->f", face_normal, a[None, :] - face_vert[:, 0])
  db = jnp.einsum("fd,fd->f", face_normal, b[None, :] - face_vert[:, 0])
  sep_face = jnp.minimum(da, db) - r
  bf = jnp.argmax(sep_face)

  # --- edge-cross axes: cross(hull edge dir, segment dir) ---
  e_dirs = edge_v[:, 1] - edge_v[:, 0]  # (ne, 3)
  cross = jnp.cross(e_dirs, (b - a)[None, :])
  cross_n = math.safe_norm(cross, axis=1)
  cross = cross / jnp.maximum(1e-12, cross_n)[:, None]
  # orient each axis from hull toward the capsule (centroid heuristic)
  centroid = jnp.mean(vert, axis=0)
  orient = jnp.einsum("ed,d->e", cross, cen - centroid)
  cross = cross * jnp.sign(orient)[:, None]
  # separation: min over segment minus max over hull verts, minus radius
  seg_min = jnp.minimum(cross @ a, cross @ b)
  hull_max = jnp.max(cross @ vert.T, axis=1)
  sep_edge = seg_min - hull_max - r
  sep_edge = jnp.where(cross_n < 1e-9, -jnp.inf, sep_edge)
  be = jnp.argmax(sep_edge)
  # parallel hull edges (e.g. a meshified cylinder's vertical edges) tie on
  # the cross axis; argmax picks an arbitrary one, but the contact must use
  # the SUPPORT edge along the winning axis or d_edge is computed to the
  # wrong edge.  Re-select among (near-)parallel-axis edges by support.
  # capture the winning separation BEFORE the support reselect: the reselect
  # may land on a degenerate-axis edge whose sep_edge is the -inf sentinel,
  # which would silently flip use_edge to the face case.
  best_edge_sep = sep_edge[be]
  n_best = cross[be]
  compat = jnp.einsum("ed,d->e", cross, n_best) > 1.0 - 1e-6
  # exclude degenerate axes (cross_n below the validity floor): a
  # near-degenerate axis normalizes to a noise-directed unit vector that can
  # pass the compat test and win the support reselect.
  compat = compat & (cross_n >= 1e-9)
  support = jnp.einsum("ed,d->e", 0.5 * (edge_v[:, 0] + edge_v[:, 1]), n_best)
  be = jnp.argmax(jnp.where(compat, support, -jnp.inf))

  use_edge = best_edge_sep > sep_face[bf] + _EDGE_TOL

  # --- edge contact: closest points between segment and the winning edge ---
  pa, pb = math.closest_segment_to_segment_points(
      a, b, edge_v[be, 0], edge_v[be, 1]
  )
  n_edge = cross[be]
  d_edge = jnp.dot(pa - pb, n_edge) - r
  p_edge = pa - n_edge * (r + 0.5 * d_edge)

  # --- face contacts: clip segment onto the face's side planes ---
  nf = face_normal[bf]
  fv = face_vert[bf]
  mfv = fv.shape[0]
  t_lo, t_hi = jnp.zeros((), dtype), jnp.ones((), dtype)
  ab = b - a
  for k in range(mfv):
    p0 = fv[k]
    p1 = fv[(k + 1) % mfv]
    edge_out = jnp.cross(p1 - p0, nf)  # outward side-plane normal
    num = jnp.dot(p0 - a, edge_out)
    den = jnp.dot(ab, edge_out)
    t_cross = num / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    entering = den < 0  # moving inside
    t_lo = jnp.where(entering, jnp.maximum(t_lo, t_cross), t_lo)
    t_hi = jnp.where(~entering, jnp.minimum(t_hi, t_cross), t_hi)
  degenerate = t_lo > t_hi
  t_mid = jnp.clip(0.5 * (t_lo + t_hi), 0.0, 1.0)
  t_lo = jnp.where(degenerate, t_mid, jnp.clip(t_lo, 0.0, 1.0))
  t_hi = jnp.where(degenerate, t_mid, jnp.clip(t_hi, 0.0, 1.0))

  k = _smooth_k()
  s_edge = best_edge_sep - sep_face[bf]  # > 0 -> edge case wins
  dists, poss, frames = [], [], []
  for idx, t in enumerate((t_lo, t_hi)):
    p_seg = a + t * ab
    d_face = jnp.dot(nf, p_seg - fv[0]) - r
    # contact normal points from capsule (geom1) into hull (geom2)
    p_face_c = p_seg + (-nf) * (r + 0.5 * d_face)
    if k is None or idx == 1:
      p_use = jnp.where(use_edge, p_edge, p_face_c)
      d_use = jnp.where(use_edge, d_edge, d_face)
      n_use = jnp.where(use_edge, -n_edge, -nf)
    else:
      p_use = math.sigmoid_blend(s_edge, p_edge, p_face_c, k)
      d_use = math.sigmoid_blend(s_edge, d_edge, d_face, k)
      n_use = _renorm(math.sigmoid_blend(s_edge, -n_edge, -nf, k))
    if idx == 1:  # edge contact occupies one slot only
      d_use = jnp.where(use_edge, 1.0, d_use)
    n_world = mat2 @ n_use
    p_world = pos2 + mat2 @ p_use
    dists.append(d_use)
    poss.append(p_world)
    frames.append(math.make_frame(n_world))
  return jnp.stack(dists), jnp.stack(poss), jnp.stack(frames)


def _manifold_points(pts, mask, depth, n, dtype):
  """Selects up to 4 well-spread valid points (reference :183-235).

  Returns (idx (4,), dup (4,) bool) — dup marks slots that would repeat an
  already-selected (or spatially coincident) point; callers deactivate them
  so duplicate constraint rows never double contact forces."""
  big_neg = jnp.asarray(-1e10, dtype)

  def exclude_near(score, chosen_pts):
    for cp in chosen_pts:
      near = jnp.sum((pts - cp[None, :]) ** 2, axis=1) < 1e-12
      score = jnp.where(near, big_neg, score)
    return score

  score0 = jnp.where(mask, -depth, big_neg)  # deepest first
  i0 = jnp.argmax(score0)
  p0 = pts[i0]

  d1 = jnp.where(mask, jnp.sum((pts - p0) ** 2, axis=1), big_neg)
  d1 = exclude_near(d1, [p0])
  i1 = jnp.argmax(d1)
  p1 = pts[i1]
  dup1 = d1[i1] <= 0

  cr = jnp.cross(pts - p0, p1[None, :] - p0)
  area = jnp.einsum("kd,d->k", cr, n)
  s2 = exclude_near(jnp.where(mask, jnp.abs(area), big_neg), [p0, p1])
  i2 = jnp.argmax(s2)
  p2 = pts[i2]
  dup2 = s2[i2] <= 1e-12

  cr2 = jnp.cross(pts - p0, p2[None, :] - p0)
  area2 = jnp.einsum("kd,d->k", cr2, n)
  sign = jnp.sign(area[i2])
  s3 = exclude_near(jnp.where(mask, -sign * area2, big_neg), [p0, p1, p2])
  i3 = jnp.argmax(s3)
  dup3 = s3[i3] <= 1e-12

  idx = jnp.stack([i0, i1, i2, i3])
  dup = jnp.stack([jnp.zeros((), bool), dup1, dup2, dup3])
  return idx, dup


def _sat_winners_jnp(pos1, mat1, pos2, mat2, hull1: ConvexMesh,
                     hull2: ConvexMesh):
  """SAT axis-enumeration winners for one pair (the jnp reference path).

  Returns (seps (3,), idx (4,) int32): seps = [sep1_best, sep2_best,
  best_edge_sep], idx = [bf1, bf2, be1, be2] with the edge pair
  re-selected by support along the winning axis."""
  dtype = pos1.dtype
  v1, fv1, fn1, ev1 = _hull_consts(hull1, dtype)
  v2, fv2, fn2, ev2 = _hull_consts(hull2, dtype)

  # world-frame geometry
  w1 = pos1 + v1 @ mat1.T
  w2 = pos2 + v2 @ mat2.T
  n1 = fn1 @ mat1.T
  n2 = fn2 @ mat2.T
  f1_0 = pos1 + fv1[:, 0] @ mat1.T
  f2_0 = pos2 + fv2[:, 0] @ mat2.T

  # --- face axes of hull1: separation of hull2 behind each face ---
  off1 = jnp.einsum("fd,fd->f", n1, f1_0)
  sep1 = jnp.min(w2 @ n1.T, axis=0) - off1  # (nf1,)
  bf1 = jnp.argmax(sep1)

  # --- face axes of hull2 ---
  off2 = jnp.einsum("fd,fd->f", n2, f2_0)
  sep2 = jnp.min(w1 @ n2.T, axis=0) - off2
  bf2 = jnp.argmax(sep2)

  # --- edge-edge axes ---
  e1a = pos1 + ev1[:, 0] @ mat1.T
  e1b = pos1 + ev1[:, 1] @ mat1.T
  e2a = pos2 + ev2[:, 0] @ mat2.T
  e2b = pos2 + ev2[:, 1] @ mat2.T
  d1 = e1b - e1a  # (ne1, 3)
  d2 = e2b - e2a  # (ne2, 3)
  axes = jnp.cross(d1[:, None, :], d2[None, :, :])  # (ne1, ne2, 3)
  axes_n = math.safe_norm(axes, axis=2)
  axes = axes / jnp.maximum(1e-12, axes_n)[..., None]
  # orient from hull1 to hull2
  c1 = jnp.mean(w1, axis=0)
  c2 = jnp.mean(w2, axis=0)
  orient = jnp.einsum("eft,t->ef", axes, c2 - c1)
  axes = axes * jnp.sign(orient)[..., None]
  # separation along each axis: min proj2 - max proj1
  proj1 = jnp.einsum("vd,efd->efv", w1, axes)
  proj2 = jnp.einsum("vd,efd->efv", w2, axes)
  sep_e = jnp.min(proj2, axis=2) - jnp.max(proj1, axis=2)
  sep_e = jnp.where(axes_n < 1e-6, -jnp.inf, sep_e)
  sep_e_flat = sep_e.reshape(-1)
  be = jnp.argmax(sep_e_flat)
  best_edge_sep = sep_e_flat[be]
  be1, be2 = be // sep_e.shape[1], be % sep_e.shape[1]
  # parallel edges (meshified cylinders, prisms) tie on the cross axis;
  # re-select the SUPPORTING pair along the winning axis so the closest-point
  # construction below uses the edges that actually realize the separation.
  ax = axes[be1, be2]
  compat = jnp.einsum("efd,d->ef", axes, ax) > 1.0 - 1e-6
  # exclude degenerate pairs (parallel edges): their noise-directed
  # normalized cross can align with the winning axis and route the
  # closest-point construction through the wrong edges.
  compat = compat & (axes_n >= 1e-6)
  mid1 = 0.5 * (e1a + e1b)  # (ne1, 3)
  mid2 = 0.5 * (e2a + e2b)  # (ne2, 3)
  pair_score = (mid1 @ ax)[:, None] - (mid2 @ ax)[None, :]
  pair_score = jnp.where(compat, pair_score, -jnp.inf)
  bp = jnp.argmax(pair_score.reshape(-1))
  be1, be2 = bp // sep_e.shape[1], bp % sep_e.shape[1]

  seps = jnp.stack([sep1[bf1], sep2[bf2], best_edge_sep])
  idx = jnp.stack([bf1, bf2, be1, be2]).astype(jnp.int32)
  return seps, idx


def _sat_kernel_enabled(hull1: ConvexMesh, hull2: ConvexMesh, dtype) -> bool:
  """Trace-time gate for the Pallas SAT kernel (MJTPU_PALLAS_SAT=auto|1|0).

  auto: on for f32 on the TPU backend when the (ne1, ne2, TILE_B) working
  set fits VMEM; 1 forces it on any backend (interpret mode off-TPU — used
  by the CPU parity tests); 0 disables."""
  knob = os.environ.get("MJTPU_PALLAS_SAT", "auto")
  if knob == "0":
    return False
  if dtype == jnp.float64:
    return False  # Mosaic has no f64; parity suite exercises via knob=1 f32
  from mjtpu.ops import sat as sat_mod

  if sat_mod.sat_vmem_bytes(hull1, hull2) > 10 * 2**20:
    return False
  try:
    backend = jax.default_backend()
  except RuntimeError:  # pragma: no cover
    return False
  return backend == "tpu" or knob == "1"


def _sat_winners(pos1, mat1, pos2, mat2, hull1: ConvexMesh,
                 hull2: ConvexMesh):
  """Per-pair SAT winners; under vmap the whole batch runs in the Pallas
  kernel (mjtpu/ops/sat.py) through a two-level custom_vmap seam: the
  first level (pairs) dispatches the batch, the second (envs over pairs)
  flattens (B, npair) into one kernel batch.  Differentiated traces use
  the jnp path unconditionally (custom_vmap defines no AD rules)."""
  if get_diff_config() is not None or not _sat_kernel_enabled(
      hull1, hull2, pos1.dtype):
    return _sat_winners_jnp(pos1, mat1, pos2, mat2, hull1, hull2)

  from mjtpu.ops import sat as sat_mod

  try:
    interpret = jax.default_backend() != "tpu"
  except RuntimeError:  # pragma: no cover
    interpret = True

  @jax.custom_batching.custom_vmap
  def _batched(p1, m1, p2, m2):
    return sat_mod.sat_winners_batch(
        p1, m1, p2, m2, hull1, hull2, interpret=interpret)

  @_batched.def_vmap
  def _batched_vmap(axis_size, in_batched, p1, m1, p2, m2):
    del axis_size
    assert all(in_batched), "env batch must cover all pose operands"
    b, n = p1.shape[:2]
    flat = lambda x: x.reshape((b * n,) + x.shape[2:])
    seps, idx = _batched(flat(p1), flat(m1), flat(p2), flat(m2))
    return (seps.reshape(b, n, 3), idx.reshape(b, n, 4)), (True, True)

  @jax.custom_batching.custom_vmap
  def _per_pair(p1, m1, p2, m2):
    return _sat_winners_jnp(p1, m1, p2, m2, hull1, hull2)

  @_per_pair.def_vmap
  def _per_pair_vmap(axis_size, in_batched, p1, m1, p2, m2):
    if not all(in_batched):
      bc = lambda x, batched: x if batched else jnp.broadcast_to(
          x, (axis_size,) + x.shape)
      p1, m1, p2, m2 = (bc(x, bt) for x, bt in
                        zip((p1, m1, p2, m2), in_batched))
    seps, idx = _batched(p1, m1, p2, m2)
    return (seps, idx), (True, True)

  return _per_pair(pos1, mat1, pos2, mat2)


def convex_convex(
    pos1, mat1, size1, pos2, mat2, size2, hull1: ConvexMesh, hull2: ConvexMesh
):
  """Full SAT hull-hull with face manifold clipping + edge-edge axes.

  The axis-enumeration stage (face separations + ne1*ne2 edge-cross
  separations with vertex-set projections) runs through _sat_winners —
  the Pallas kernel on TPU, the jnp path elsewhere; manifold clipping
  consumes only the winners and stays in XLA."""
  dtype = pos1.dtype
  v1, fv1, fn1, ev1 = _hull_consts(hull1, dtype)
  v2, fv2, fn2, ev2 = _hull_consts(hull2, dtype)

  # world-frame geometry for the manifold/edge-contact stage
  w1 = pos1 + v1 @ mat1.T
  w2 = pos2 + v2 @ mat2.T
  n1 = fn1 @ mat1.T
  n2 = fn2 @ mat2.T
  f1 = pos1 + jnp.einsum("fkd,xd->fkx", fv1, mat1)
  f2 = pos2 + jnp.einsum("fkd,xd->fkx", fv2, mat2)
  c1 = jnp.mean(w1, axis=0)
  c2 = jnp.mean(w2, axis=0)

  seps, idx = _sat_winners(pos1, mat1, pos2, mat2, hull1, hull2)
  sep1_best, sep2_best, best_edge_sep = seps[0], seps[1], seps[2]
  bf1, bf2, be1, be2 = idx[0], idx[1], idx[2], idx[3]

  best_face_sep = jnp.maximum(sep1_best, sep2_best)
  use_edge = best_edge_sep > best_face_sep + _EDGE_TOL

  # --- edge-edge contact: transform only the winning pair's endpoints ---
  e1 = pos1 + ev1[be1] @ mat1.T  # (2, 3)
  e2 = pos2 + ev2[be2] @ mat2.T
  pa, pb = math.closest_segment_to_segment_points(
      e1[0], e1[1], e2[0], e2[1]
  )
  n_edge, _ = math.normalize_with_norm(pb - pa)
  n_edge = jnp.where(
      jnp.dot(n_edge, c2 - c1) < 0, -n_edge, n_edge
  )
  edge_dist = jnp.dot(pb - pa, n_edge)
  edge_pos = 0.5 * (pa + pb)

  # --- face-face manifold: reference face on the hull with larger sep ---
  ref_is_1 = sep1_best >= sep2_best

  def manifold(ref_face_verts, ref_n, inc_faces, inc_normals):
    """Clip incident face (most anti-parallel) against ref side planes."""
    inc_i = jnp.argmin(inc_normals @ ref_n)
    inc = inc_faces[inc_i]  # (mfv_i, 3)
    mfv_r = ref_face_verts.shape[0]
    mfv_i = inc.shape[0]

    ra = ref_face_verts
    rb = jnp.roll(ref_face_verts, -1, axis=0)
    side_n = jnp.cross(rb - ra, jnp.broadcast_to(ref_n, ra.shape))  # outward

    def inside_ref(p):
      return jnp.all(jnp.einsum("kd,kd->k", p[None] - ra, side_n) <= 1e-10)

    cands, mask = [], []
    # (a) incident verts inside all side planes
    for k in range(mfv_i):
      cands.append(inc[k])
      mask.append(inside_ref(inc[k]))
    # (b) incident edge x side plane intersections
    for k in range(mfv_i):
      p0, p1 = inc[k], inc[(k + 1) % mfv_i]
      for s in range(mfv_r):
        den = jnp.dot(p1 - p0, side_n[s])
        t = jnp.dot(ra[s] - p0, side_n[s]) / jnp.where(
            jnp.abs(den) < 1e-12, 1e-12, den
        )
        p = p0 + t * (p1 - p0)
        ok = (t > 0) & (t < 1) & (jnp.abs(den) > 1e-12) & inside_ref(p)
        cands.append(p)
        mask.append(ok)
    # (c) ref verts projected onto the incident plane (ref inside incident)
    inc_n = inc_normals[inc_i]
    ia = inc
    ib = jnp.roll(inc, -1, axis=0)
    iside_n = jnp.cross(ib - ia, jnp.broadcast_to(inc_n, ia.shape))

    def inside_inc(p):
      return jnp.all(jnp.einsum("kd,kd->k", p[None] - ia, iside_n) <= 1e-10)

    for k in range(mfv_r):
      # project ref vert onto incident plane along ref normal
      t = jnp.dot(inc[0] - ra[k], inc_n) / jnp.maximum(
          1e-12, jnp.abs(jnp.dot(ref_n, inc_n))
      ) * jnp.sign(jnp.dot(ref_n, inc_n))
      p = ra[k] + t * ref_n
      cands.append(p)
      mask.append(inside_inc(p))

    pts = jnp.stack(cands)
    msk = jnp.stack(mask)
    # all candidates lie on the incident surface ((c) points are projected
    # onto it), so the surface gap is the height above the ref plane
    depth = jnp.einsum("kd,d->k", pts - ref_face_verts[0], ref_n)

    idx, dup = _manifold_points(pts, msk & (depth < 1e9), depth, ref_n, dtype)
    sel_p = pts[idx]
    sel_d = depth[idx]
    sel_valid = msk[idx] & ~dup
    sel_d = jnp.where(sel_valid, sel_d, 1.0)  # deactivate invalid/dup slots
    pos = sel_p - 0.5 * sel_d[:, None] * ref_n[None, :]
    return sel_d, pos

  d_a, p_a = manifold(f1[bf1], n1[bf1], f2, n2)
  d_b, p_b = manifold(f2[bf2], n2[bf2], f1, n1)
  k = _smooth_k()
  s_ref = sep1_best - sep2_best  # > 0 -> hull1 is the reference face
  # for hull2-reference the contact normal (geom1 -> geom2) is -ref_n
  if k is None:
    n_face = jnp.where(ref_is_1, n1[bf1], -n2[bf2])
    d_face = jnp.where(ref_is_1, d_a, d_b)
    p_face = jnp.where(ref_is_1, p_a, p_b)
  else:
    n_face = _renorm(math.sigmoid_blend(s_ref, n1[bf1], -n2[bf2], k))
    d_face = math.sigmoid_blend(s_ref, d_a, d_b, k)
    p_face = math.sigmoid_blend(s_ref, p_a, p_b, k)

  dist = jnp.where(
      use_edge,
      jnp.concatenate([edge_dist[None], jnp.full((3,), 1.0, dtype)]),
      d_face,
  )
  pos = jnp.where(
      use_edge,
      jnp.concatenate([edge_pos[None, :], jnp.zeros((3, 3), dtype)]),
      p_face,
  )
  s_e = best_edge_sep - best_face_sep
  if k is None:
    n_c = jnp.where(use_edge, n_edge, n_face)
  else:
    # blend the deepest slot's dist/pos/normal across the edge/face switch;
    # slots 1-3 keep the hard edge deactivation (count is discrete)
    dist = dist.at[0].set(math.sigmoid_blend(s_e, edge_dist, d_face[0], k))
    pos = pos.at[0].set(math.sigmoid_blend(s_e, edge_pos, p_face[0], k))
    n_c = _renorm(math.sigmoid_blend(s_e, n_edge, n_face, k))
  frame = jnp.broadcast_to(math.make_frame(n_c), (4, 3, 3))
  return dist, pos, frame
