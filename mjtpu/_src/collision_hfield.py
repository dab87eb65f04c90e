"""Height-field collisions.

Reference capability map: mujoco_torch/_src/collision_hfield.py (prism
construction :227-291, sphere/capsule/convex dispatch :352-390).  The
reference ran this path uncompiled with a host loop over candidates
(collision_driver.py:332-437); here the subgrid size is a static model
constant (from hfield tick + geom rbound, both host-known) so the entire
path jits: heights are gathered dynamically around the object's footprint,
surface triangles are built as traced arrays, and the narrowphase vmaps
over triangles with a top-4 manifold selection (SURVEY.md §7 step 6).

v1 collides against the terrain's surface triangles (two per cell).  Side
walls of the boundary prisms are not modeled — objects should stay on top
of the terrain (the reference's prisms share this practical envelope).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src import math
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


def _surface_triangles(m: Model, hid: int, pos1, mat1, obj_center, hy: int, hx: int):
  """Traced (T, 3, 3) world triangles under the object's footprint."""
  nrow, ncol = int(m.hfield_nrow[hid]), int(m.hfield_ncol[hid])
  size = m.hfield_size[hid]  # (sx, sy, ztop, zbottom) — static numpy
  sx, sy, ztop = float(size[0]), float(size[1]), float(size[2])
  adr = int(m.hfield_adr[hid])
  dx = 2.0 * sx / max(1, ncol - 1)
  dy = 2.0 * sy / max(1, nrow - 1)

  # object center in hfield frame
  lc = mat1.T @ (obj_center - pos1)
  ci = jnp.clip(
      jnp.floor((lc[0] + sx) / dx).astype(jnp.int32), hx, ncol - 2 - hx
  )
  ri = jnp.clip(
      jnp.floor((lc[1] + sy) / dy).astype(jnp.int32), hy, nrow - 2 - hy
  )

  # gather (2hy+2, 2hx+2) grid of heights around (ri, ci)
  rows = ri - hy + jnp.arange(2 * hy + 2)
  cols = ci - hx + jnp.arange(2 * hx + 2)
  rows = jnp.clip(rows, 0, nrow - 1)
  cols = jnp.clip(cols, 0, ncol - 1)
  flat_idx = adr + rows[:, None] * ncol + cols[None, :]
  z = m.hfield_data[flat_idx.reshape(-1)].reshape(2 * hy + 2, 2 * hx + 2) * ztop

  xs = -sx + cols.astype(z.dtype) * dx
  ys = -sy + rows.astype(z.dtype) * dy
  # vertices of each cell (r, c):四 corners
  x0 = xs[None, :-1].repeat(2 * hy + 1, 0)
  x1 = xs[None, 1:].repeat(2 * hy + 1, 0)
  y0 = ys[:-1, None].repeat(2 * hx + 1, 1)
  y1 = ys[1:, None].repeat(2 * hx + 1, 1)
  z00 = z[:-1, :-1]
  z01 = z[:-1, 1:]
  z10 = z[1:, :-1]
  z11 = z[1:, 1:]

  def pt(x, y, zz):
    return jnp.stack([x, y, zz], axis=-1).reshape(-1, 3)

  p00, p01, p10, p11 = pt(x0, y0, z00), pt(x1, y0, z01), pt(x0, y1, z10), pt(x1, y1, z11)
  # two triangles per cell (mj splits along the (00,11) diagonal)
  tris = jnp.concatenate(
      [
          jnp.stack([p00, p01, p11], axis=1),
          jnp.stack([p00, p11, p10], axis=1),
      ]
  )  # (T, 3, 3) local
  tris_w = pos1[None, None, :] + jnp.einsum("tkd,xd->tkx", tris, mat1)
  return tris_w


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
  """Top-4 distinct contacts by penetration (suppress near-duplicates)."""
  chosen_d, chosen_p, chosen_n = [], [], []
  d_work = dist
  for k in range(4):
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
  return (
      jnp.stack(chosen_d),
      jnp.stack(chosen_p),
      jnp.stack([math.make_frame(n) for n in chosen_n]),
  )


def hfield_sphere(
    pos1, mat1, size1, pos2, mat2, size2, m: Model, hid: int, rbound: float
):
  dtype = pos1.dtype
  r = size2[0]
  hy, hx = _subgrid_shape(m, hid, rbound)
  tris = _surface_triangles(m, hid, pos1, mat1, pos2, hy, hx)

  up = mat1[:, 2]

  def one(tri):
    dist, n = _point_triangle(tri, pos2, r, up)
    pos = pos2 - n * (r + 0.5 * dist)
    return dist, pos, n

  dist, pos, nrm = jax.vmap(one)(tris)
  return _select4(dist, pos, nrm, dtype)


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


def hfield_capsule(
    pos1, mat1, size1, pos2, mat2, size2, m: Model, hid: int, rbound: float
):
  dtype = pos1.dtype
  r, h = size2[0], size2[1]
  hy, hx = _subgrid_shape(m, hid, rbound)
  tris = _surface_triangles(m, hid, pos1, mat1, pos2, hy, hx)
  axis = mat2[:, 2]
  a, b = pos2 - h * axis, pos2 + h * axis

  def one(tri):
    # closest point between segment and triangle: sample closest to both ends
    # plus the segment point nearest the triangle plane
    c1 = _closest_on_triangle(tri[0], tri[1], tri[2], a)
    c2 = _closest_on_triangle(tri[0], tri[1], tri[2], b)
    s1 = math.closest_segment_point(a, b, c1)
    s2 = math.closest_segment_point(a, b, c2)
    c1b = _closest_on_triangle(tri[0], tri[1], tri[2], s1)
    c2b = _closest_on_triangle(tri[0], tri[1], tri[2], s2)
    d1 = jnp.sum((s1 - c1b) ** 2)
    d2 = jnp.sum((s2 - c2b) ** 2)
    use1 = d1 <= d2
    s = jnp.where(use1, s1, s2)
    dist, n = _point_triangle(tri, s, r, mat1[:, 2])
    pos = s - n * (r + 0.5 * dist)
    return dist, pos, n

  dist, pos, nrm = jax.vmap(one)(tris)
  return _select4(dist, pos, nrm, dtype)


def hfield_convex(
    pos1, mat1, size1, pos2, mat2, size2, m: Model, hid: int, hull2: ConvexMesh
):
  """Convex hull vs terrain: per-vertex penetration against the local
  surface triangle (the hfield analog of plane_convex's deepest-4 verts)."""
  dtype = pos1.dtype
  nrow, ncol = int(m.hfield_nrow[hid]), int(m.hfield_ncol[hid])
  size = m.hfield_size[hid]
  sx, sy, ztop = float(size[0]), float(size[1]), float(size[2])
  adr = int(m.hfield_adr[hid])
  dx = 2.0 * sx / max(1, ncol - 1)
  dy = 2.0 * sy / max(1, nrow - 1)

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
