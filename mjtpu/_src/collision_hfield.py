"""Height-field collisions.

Reference capability map: mujoco_torch/_src/collision_hfield.py (prism
construction :227-291, sphere/capsule/convex dispatch :352-390).  The
reference ran this path uncompiled with a host loop over candidates
(collision_driver.py:332-437); here the subgrid size is a static model
constant (from hfield tick + geom rbound, both host-known) so the entire
path jits: heights are gathered dynamically around the object's footprint,
surface triangles are built as traced arrays, and the narrowphase runs
over triangles with a top-4 manifold selection (SURVEY.md §7 step 6).

The sphere/capsule narrowphase runs in the hfield's LOCAL frame (terrain
up = +z): the object segment is pulled into the hfield frame, triangles
are never rotated, and only the 4 manifold winners are pushed back to
world.  Under vmap the whole stage dispatches to the Pallas kernel
(mjtpu/ops/hfield.py) through a custom_vmap seam — triangle construction
and per-triangle tests stay in VMEM, only the (R, C) height window
crosses HBM.  Knob: MJTPU_PALLAS_HFIELD={auto,1,0}.

v1 collides against the terrain's surface triangles (two per cell).  Side
walls of the boundary prisms are not modeled — objects should stay on top
of the terrain (the reference's prisms share this practical envelope).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src import math
from mjtpu._src.diff_config import get_diff_config
from mjtpu._src.types import ConvexMesh, Model

# cap on the static subgrid half-extent (cells); bigger objects clamp here
_MAX_HALF_CELLS = 8


def _subgrid_shape(m: Model, hid: int, rbound: float) -> tuple[int, int]:
  nrow, ncol = int(m.hfield_nrow[hid]), int(m.hfield_ncol[hid])
  sx, sy = float(m.hfield_size[hid][0]), float(m.hfield_size[hid][1])
  dx = 2.0 * sx / max(1, ncol - 1)
  dy = 2.0 * sy / max(1, nrow - 1)
  hx = min(_MAX_HALF_CELLS, int(np.ceil(rbound / max(1e-9, dx))) + 1)
  hy = min(_MAX_HALF_CELLS, int(np.ceil(rbound / max(1e-9, dy))) + 1)
  hx = max(0, min(hx, (ncol - 2) // 2))
  hy = max(0, min(hy, (nrow - 2) // 2))
  return hy, hx


def _grid_consts(m: Model, hid: int):
  nrow, ncol = int(m.hfield_nrow[hid]), int(m.hfield_ncol[hid])
  size = m.hfield_size[hid]  # (sx, sy, ztop, zbottom) — static numpy
  sx, sy, ztop = float(size[0]), float(size[1]), float(size[2])
  dx = 2.0 * sx / max(1, ncol - 1)
  dy = 2.0 * sy / max(1, nrow - 1)
  return nrow, ncol, sx, sy, ztop, int(m.hfield_adr[hid]), dx, dy


def _height_window(m: Model, hid: int, lc, hy: int, hx: int):
  """Gathers the (R, C) height window under the local object center ``lc``
  plus its origin (x0, y0); R = 2hy+2 rows, C = 2hx+2 cols."""
  nrow, ncol, sx, sy, ztop, adr, dx, dy = _grid_consts(m, hid)
  ci = jnp.clip(
      jnp.floor((lc[0] + sx) / dx).astype(jnp.int32), hx, ncol - 2 - hx
  )
  ri = jnp.clip(
      jnp.floor((lc[1] + sy) / dy).astype(jnp.int32), hy, nrow - 2 - hy
  )
  rows = jnp.clip(ri - hy + jnp.arange(2 * hy + 2), 0, nrow - 1)
  cols = jnp.clip(ci - hx + jnp.arange(2 * hx + 2), 0, ncol - 1)
  flat_idx = adr + rows[:, None] * ncol + cols[None, :]
  z = (m.hfield_data[flat_idx.reshape(-1)]
       .reshape(2 * hy + 2, 2 * hx + 2) * ztop)
  dtype = z.dtype
  x0 = -sx + cols[0].astype(dtype) * dx
  y0 = -sy + rows[0].astype(dtype) * dy
  return z, x0, y0


def _local_triangles(z, x0, y0, dx: float, dy: float):
  """(T, 3, 3) local surface triangles from one height window.  Triangle
  order (all first-diagonal triangles, then all second) is load-bearing:
  manifold argmin tie-breaking depends on it, and the Pallas kernel
  replicates it band by band."""
  rr, cc = z.shape
  dtype = z.dtype
  xs = x0 + jnp.arange(cc, dtype=dtype) * dx
  ys = y0 + jnp.arange(rr, dtype=dtype) * dy
  x0g = xs[None, :-1].repeat(rr - 1, 0)
  x1g = xs[None, 1:].repeat(rr - 1, 0)
  y0g = ys[:-1, None].repeat(cc - 1, 1)
  y1g = ys[1:, None].repeat(cc - 1, 1)
  z00, z01 = z[:-1, :-1], z[:-1, 1:]
  z10, z11 = z[1:, :-1], z[1:, 1:]

  def pt(x, y, zz):
    return jnp.stack([x, y, zz], axis=-1).reshape(-1, 3)

  p00, p01 = pt(x0g, y0g, z00), pt(x1g, y0g, z01)
  p10, p11 = pt(x0g, y1g, z10), pt(x1g, y1g, z11)
  # two triangles per cell (mj splits along the (00, 11) diagonal)
  return jnp.concatenate(
      [
          jnp.stack([p00, p01, p11], axis=1),
          jnp.stack([p00, p11, p10], axis=1),
      ]
  )


def _closest_on_triangle(a, b, c, p):
  """Closest point on triangle abc to p (vectorizable)."""
  n = math.normalize(jnp.cross(b - a, c - a))
  proj = p - jnp.dot(p - a, n) * n
  # inside tests via edge normals
  inside = (
      (jnp.dot(jnp.cross(b - a, n), proj - a) <= 0)
      & (jnp.dot(jnp.cross(c - b, n), proj - b) <= 0)
      & (jnp.dot(jnp.cross(a - c, n), proj - c) <= 0)
  )
  # note: edge outward normal orientation depends on winding; test both signs
  inside2 = (
      (jnp.dot(jnp.cross(b - a, n), proj - a) >= 0)
      & (jnp.dot(jnp.cross(c - b, n), proj - b) >= 0)
      & (jnp.dot(jnp.cross(a - c, n), proj - c) >= 0)
  )
  inside = inside | inside2
  e1 = math.closest_segment_point(a, b, p)
  e2 = math.closest_segment_point(b, c, p)
  e3 = math.closest_segment_point(c, a, p)
  pts = jnp.stack([e1, e2, e3])
  d2 = jnp.sum((pts - p[None]) ** 2, axis=1)
  edge_best = pts[jnp.argmin(d2)]
  return jnp.where(inside, proj, edge_best)


def _select4(dist, pos, normal, dtype):
  """Top-4 distinct contacts by penetration (suppress near-duplicates);
  returns raw normals — callers build frames."""
  chosen_d, chosen_p, chosen_n = [], [], []
  d_work = dist
  for _ in range(4):
    i = jnp.argmin(d_work)
    di = d_work[i]
    ok = jnp.isfinite(di)
    pi = jnp.where(ok, pos[i], 0.0)
    ni = jnp.where(ok, normal[i], jnp.array([0.0, 0.0, 1.0], dtype))
    chosen_d.append(jnp.where(ok, di, 1.0))
    chosen_p.append(pi)
    chosen_n.append(ni)
    # suppress near-duplicates of the chosen point
    near = jnp.sum((pos - pi[None]) ** 2, axis=1) < 1e-10
    d_work = jnp.where(near, jnp.inf, d_work)
  return jnp.stack(chosen_d), jnp.stack(chosen_p), jnp.stack(chosen_n)


def _point_triangle(tri, p, r, up):
  """Signed sphere-triangle gap: perpendicular depth when the projection is
  inside the triangle (supports deep penetration), unsigned edge distance
  otherwise (ridge contacts only activate on touch)."""
  a, b, c = tri[0], tri[1], tri[2]
  n_tri = math.normalize(jnp.cross(b - a, c - a))
  n_tri = jnp.where(jnp.dot(n_tri, up) < 0, -n_tri, n_tri)
  sd = jnp.dot(n_tri, p - a)
  proj = p - sd * n_tri
  closest = _closest_on_triangle(a, b, c, p)
  inside = jnp.sum((closest - proj) ** 2) < 1e-16
  to_c, dc = math.normalize_with_norm(p - closest)
  n_out = jnp.where(dc < 1e-12, up, to_c)
  dist = jnp.where(inside, sd, dc) - r
  n = jnp.where(inside, n_tri, n_out)
  return dist, n


def _segment_triangle(tri, a, b, r, up, has_axis: bool):
  """Capsule segment (a, b) vs one triangle (a == b degenerates to the
  sphere test); local frame, up = +z."""
  if has_axis:
    # closest point between segment and triangle: sample closest to both
    # ends plus the segment point nearest the triangle plane
    c1 = _closest_on_triangle(tri[0], tri[1], tri[2], a)
    c2 = _closest_on_triangle(tri[0], tri[1], tri[2], b)
    s1 = math.closest_segment_point(a, b, c1)
    s2 = math.closest_segment_point(a, b, c2)
    c1b = _closest_on_triangle(tri[0], tri[1], tri[2], s1)
    c2b = _closest_on_triangle(tri[0], tri[1], tri[2], s2)
    d1 = jnp.sum((s1 - c1b) ** 2)
    d2 = jnp.sum((s2 - c2b) ** 2)
    s = jnp.where(d1 <= d2, s1, s2)
  else:
    s = a
  dist, n = _point_triangle(tri, s, r, up)
  pos = s - n * (r + 0.5 * dist)
  return dist, pos, n


def _manifold_jnp(zwin, origin, a, b, r, dx: float, dy: float,
                  has_axis: bool):
  """jnp reference manifold: build local triangles, test each, select 4."""
  dtype = zwin.dtype
  tris = _local_triangles(zwin, origin[0], origin[1], dx, dy)
  up = jnp.array([0.0, 0.0, 1.0], dtype)

  def one(tri):
    return _segment_triangle(tri, a, b, r, up, has_axis)

  dist, pos, nrm = jax.vmap(one)(tris)
  return _select4(dist, pos, nrm, dtype)


def _kernel_enabled(hy: int, hx: int, dtype) -> bool:
  """Trace-time gate for the Pallas hfield kernel
  (MJTPU_PALLAS_HFIELD=auto|1|0), mirroring collision_convex's SAT gate."""
  knob = os.environ.get("MJTPU_PALLAS_HFIELD", "auto")
  if knob == "0":
    return False
  if dtype == jnp.float64:
    return False  # Mosaic has no f64; parity suite exercises via knob=1 f32
  from mjtpu.ops import hfield as hf_mod

  if hf_mod.hfield_vmem_bytes(hy, hx) > 10 * 2**20:
    return False
  try:
    backend = jax.default_backend()
  except RuntimeError:  # pragma: no cover
    return False
  return backend == "tpu" or knob == "1"


def _surface_manifold(zwin, origin, a, b, r, hy: int, hx: int, dx: float,
                      dy: float, has_axis: bool):
  """Per-pair surface manifold; under vmap the whole batch runs in the
  Pallas kernel (mjtpu/ops/hfield.py) through the same two-level
  custom_vmap seam as collision_convex._sat_winners: level one covers the
  pair batch, level two flattens (envs, pairs) into one kernel batch.
  Differentiated traces use the jnp path (custom_vmap has no AD rules)."""
  if get_diff_config() is not None or not _kernel_enabled(hy, hx,
                                                          zwin.dtype):
    return _manifold_jnp(zwin, origin, a, b, r, dx, dy, has_axis)

  from mjtpu.ops import hfield as hf_mod

  try:
    interpret = jax.default_backend() != "tpu"
  except RuntimeError:  # pragma: no cover
    interpret = True

  @jax.custom_batching.custom_vmap
  def _batched(zw, org, aa, bb, rr):
    return hf_mod.manifold_batch(zw, org, aa, bb, rr, hy, hx, dx, dy,
                                 has_axis, interpret=interpret)

  @_batched.def_vmap
  def _batched_vmap(axis_size, in_batched, zw, org, aa, bb, rr):
    # the radius (model constant) is typically NOT env-batched; broadcast
    # whatever isn't so the flatten below is uniform
    if not all(in_batched):
      bc = lambda x, batched: x if batched else jnp.broadcast_to(
          x, (axis_size,) + x.shape)
      zw, org, aa, bb, rr = (bc(x, bt) for x, bt in
                             zip((zw, org, aa, bb, rr), in_batched))
    nb, npair = zw.shape[:2]
    flat = lambda x: x.reshape((nb * npair,) + x.shape[2:])
    dist, pos, nrm = _batched(flat(zw), flat(org), flat(aa), flat(bb),
                              flat(rr))
    unflat = lambda x: x.reshape((nb, npair) + x.shape[1:])
    return (unflat(dist), unflat(pos), unflat(nrm)), (True, True, True)

  @jax.custom_batching.custom_vmap
  def _per_pair(zw, org, aa, bb, rr):
    return _manifold_jnp(zw, org, aa, bb, rr, dx, dy, has_axis)

  @_per_pair.def_vmap
  def _per_pair_vmap(axis_size, in_batched, zw, org, aa, bb, rr):
    if not all(in_batched):
      bc = lambda x, batched: x if batched else jnp.broadcast_to(
          x, (axis_size,) + x.shape)
      zw, org, aa, bb, rr = (bc(x, bt) for x, bt in
                             zip((zw, org, aa, bb, rr), in_batched))
    dist, pos, nrm = _batched(zw, org, aa, bb, rr)
    return (dist, pos, nrm), (True, True, True)

  return _per_pair(zwin, origin, a, b, r)


def _hfield_object(pos1, mat1, pos2, mat2, size2, m: Model, hid: int,
                   rbound: float, has_axis: bool):
  """Shared sphere/capsule path: local-frame manifold + world mapping."""
  dtype = pos1.dtype
  hy, hx = _subgrid_shape(m, hid, rbound)
  _, _, _, _, _, _, dx, dy = _grid_consts(m, hid)
  lc = mat1.T @ (pos2 - pos1)
  if has_axis:
    axis_l = mat1.T @ (mat2 @ jnp.array([0.0, 0.0, 1.0], dtype))
    h = size2[1]
    a, b = lc - h * axis_l, lc + h * axis_l
  else:
    a = b = lc
  zwin, x0, y0 = _height_window(m, hid, lc, hy, hx)
  origin = jnp.stack([x0, y0])
  dist4, pos_l, n_l = _surface_manifold(
      zwin, origin, a, b, size2[0], hy, hx, dx, dy, has_axis)
  pos_w = pos1[None, :] + pos_l @ mat1.T
  n_w = n_l @ mat1.T
  frame4 = jnp.stack([math.make_frame(n) for n in n_w])
  return dist4, pos_w, frame4


def hfield_sphere(
    pos1, mat1, size1, pos2, mat2, size2, m: Model, hid: int, rbound: float
):
  return _hfield_object(pos1, mat1, pos2, mat2, size2, m, hid, rbound,
                        has_axis=False)


def hfield_capsule(
    pos1, mat1, size1, pos2, mat2, size2, m: Model, hid: int, rbound: float
):
  return _hfield_object(pos1, mat1, pos2, mat2, size2, m, hid, rbound,
                        has_axis=True)


def hfield_convex(
    pos1, mat1, size1, pos2, mat2, size2, m: Model, hid: int, hull2: ConvexMesh
):
  """Convex hull vs terrain: per-vertex penetration against the local
  surface triangle (the hfield analog of plane_convex's deepest-4 verts).
  Stays in XLA: the workload is a per-vertex bilinear gather (no (T, B)
  triangle tensors are materialized), so there is nothing for a Pallas
  kernel to save — see PERFORMANCE.md's narrowphase closure note."""
  dtype = pos1.dtype
  nrow, ncol, sx, sy, ztop, adr, dx, dy = _grid_consts(m, hid)

  verts_w = pos2 + jnp.asarray(hull2.vert, dtype=dtype) @ mat2.T  # (nv, 3)
  verts_l = (verts_w - pos1[None]) @ mat1  # hfield-local

  def per_vertex(v):
    fx = (v[0] + sx) / dx
    fy = (v[1] + sy) / dy
    ci = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, ncol - 2)
    ri = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, nrow - 2)
    u = jnp.clip(fx - ci, 0.0, 1.0)
    w = jnp.clip(fy - ri, 0.0, 1.0)
    z00 = m.hfield_data[adr + ri * ncol + ci] * ztop
    z01 = m.hfield_data[adr + ri * ncol + ci + 1] * ztop
    z10 = m.hfield_data[adr + (ri + 1) * ncol + ci] * ztop
    z11 = m.hfield_data[adr + (ri + 1) * ncol + ci + 1] * ztop
    x0 = -sx + ci * dx
    y0 = -sy + ri * dy
    p00 = jnp.stack([x0, y0, z00])
    p01 = jnp.stack([x0 + dx, y0, z01])
    p10 = jnp.stack([x0, y0 + dy, z10])
    p11 = jnp.stack([x0 + dx, y0 + dy, z11])
    # triangle split along the (00, 11) diagonal: u >= w -> (00, 01, 11)
    in_a = u >= w
    a = p00
    b = jnp.where(in_a, p01, p11)
    c = jnp.where(in_a, p11, p10)
    n = math.normalize(jnp.cross(b - a, c - a))
    n = jnp.where(n[2] < 0, -n, n)  # up-oriented
    dist = jnp.dot(n, v - a)
    return dist, n

  dist, n_l = jax.vmap(per_vertex)(verts_l)
  idx = jnp.argsort(dist)[:4]
  dist4 = dist[idx]
  n4_w = n_l[idx] @ mat1.T  # local->world (rows)
  pos4 = verts_w[idx] - 0.5 * dist4[:, None] * n4_w
  frame4 = jnp.stack([math.make_frame(n) for n in n4_w])
  return dist4, pos4, frame4
