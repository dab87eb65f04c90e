"""Raycasting against geoms (mj_ray / mj_rayGeom).

Reference capability map: mujoco_torch/_src/ray.py (per-geom-type
intersectors :43-290, host-side geom filtering :292-324, compile-friendly
min-reduce :327-372, public ray/ray_geom :375-465).

All intersectors work in the geom local frame and return the smallest
non-negative ray parameter t (or +inf on miss).  The public ``ray`` filters
candidate geoms host-side (static) and min-reduces over vmapped per-type
groups — embarrassingly parallel for the renderer's one-ray-per-pixel use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src import math
from mjtpu._src.types import Data, GeomType, Model

_INF = jnp.inf


def _quad(a, b, c):
  """Smallest non-negative root of a t^2 + 2 b t + c = 0, else inf."""
  det = b * b - a * c
  ok = (det >= 0) & (jnp.abs(a) > 1e-15)
  sdet = jnp.sqrt(jnp.maximum(0.0, det))
  t0 = (-b - sdet) / jnp.where(jnp.abs(a) > 1e-15, a, 1e-15)
  t1 = (-b + sdet) / jnp.where(jnp.abs(a) > 1e-15, a, 1e-15)
  t = jnp.where(t0 >= 0, t0, jnp.where(t1 >= 0, t1, _INF))
  return jnp.where(ok, t, _INF)


def _ray_plane(size, lp, lv):
  t = -lp[2] / jnp.where(jnp.abs(lv[2]) < 1e-15, 1e-15, lv[2])
  p = lp + t * lv
  valid = (t >= 0) & (jnp.abs(lv[2]) > 1e-15)
  valid &= (size[0] <= 0) | (jnp.abs(p[0]) <= size[0])
  valid &= (size[1] <= 0) | (jnp.abs(p[1]) <= size[1])
  return jnp.where(valid, t, _INF)


def _ray_sphere(size, lp, lv):
  a = jnp.dot(lv, lv)
  b = jnp.dot(lp, lv)
  c = jnp.dot(lp, lp) - size[0] * size[0]
  return _quad(a, b, c)


def _ray_capsule(size, lp, lv):
  r, h = size[0], size[1]
  # cylinder side
  a = lv[0] ** 2 + lv[1] ** 2
  b = lp[0] * lv[0] + lp[1] * lv[1]
  c = lp[0] ** 2 + lp[1] ** 2 - r * r
  t_side = _quad(a, b, c)
  z = lp[2] + t_side * lv[2]
  t_side = jnp.where(jnp.abs(z) <= h, t_side, _INF)
  # end caps
  t_caps = _INF
  for sgn in (-1.0, 1.0):
    lpc = lp - jnp.array([0.0, 0.0, sgn], lp.dtype) * h
    t_c = _quad(jnp.dot(lv, lv), jnp.dot(lpc, lv), jnp.dot(lpc, lpc) - r * r)
    zc = lpc[2] + t_c * lv[2]
    t_c = jnp.where(zc * sgn >= 0, t_c, _INF)
    t_caps = jnp.minimum(t_caps, t_c)
  return jnp.minimum(t_side, t_caps)


def _ray_ellipsoid(size, lp, lv):
  s = 1.0 / size
  p, v = lp * s, lv * s
  return _quad(jnp.dot(v, v), jnp.dot(p, v), jnp.dot(p, p) - 1.0)


def _ray_cylinder(size, lp, lv):
  r, h = size[0], size[1]
  a = lv[0] ** 2 + lv[1] ** 2
  b = lp[0] * lv[0] + lp[1] * lv[1]
  c = lp[0] ** 2 + lp[1] ** 2 - r * r
  t_side = _quad(a, b, c)
  z = lp[2] + t_side * lv[2]
  t_side = jnp.where(jnp.abs(z) <= h, t_side, _INF)
  # flat disks
  t_disk = _INF
  for sgn in (-1.0, 1.0):
    t_d = (sgn * h - lp[2]) / jnp.where(jnp.abs(lv[2]) < 1e-15, 1e-15, lv[2])
    p = lp + t_d * lv
    ok = (t_d >= 0) & (p[0] ** 2 + p[1] ** 2 <= r * r) & (jnp.abs(lv[2]) > 1e-15)
    t_disk = jnp.minimum(t_disk, jnp.where(ok, t_d, _INF))
  return jnp.minimum(t_side, t_disk)


def _ray_box(size, lp, lv):
  t_best = _INF
  for axis in range(3):
    for sgn in (-1.0, 1.0):
      denom = jnp.where(jnp.abs(lv[axis]) < 1e-15, 1e-15, lv[axis])
      t = (sgn * size[axis] - lp[axis]) / denom
      p = lp + t * lv
      o1, o2 = (axis + 1) % 3, (axis + 2) % 3
      ok = (
          (t >= 0)
          & (jnp.abs(lv[axis]) > 1e-15)
          & (jnp.abs(p[o1]) <= size[o1])
          & (jnp.abs(p[o2]) <= size[o2])
      )
      t_best = jnp.minimum(t_best, jnp.where(ok, t, _INF))
  return t_best


def _ray_triangles(verts_a, verts_b, verts_c, lp, lv):
  """Möller-Trumbore over a triangle soup: min t (vectorized)."""
  e1 = verts_b - verts_a
  e2 = verts_c - verts_a
  h = jnp.cross(lv[None, :], e2)
  det = jnp.einsum("td,td->t", e1, h)
  inv = 1.0 / jnp.where(jnp.abs(det) < 1e-15, 1e-15, det)
  s = lp[None, :] - verts_a
  u = jnp.einsum("td,td->t", s, h) * inv
  q = jnp.cross(s, e1)
  v = jnp.einsum("d,td->t", lv, q) * inv
  t = jnp.einsum("td,td->t", e2, q) * inv
  ok = (jnp.abs(det) > 1e-15) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= 0)
  return jnp.min(jnp.where(ok, t, _INF))


_RAY_FUNC = {
    GeomType.PLANE: _ray_plane,
    GeomType.SPHERE: _ray_sphere,
    GeomType.CAPSULE: _ray_capsule,
    GeomType.ELLIPSOID: _ray_ellipsoid,
    GeomType.CYLINDER: _ray_cylinder,
    GeomType.BOX: _ray_box,
}


def ray_geom(pos, mat, size, pnt, vec, geomtype, mesh_tris=None):
  """Ray vs a single geom (world pose); returns t along `vec` or inf."""
  lp = mat.T @ (pnt - pos)
  lv = mat.T @ vec
  if geomtype == GeomType.MESH:
    return _ray_triangles(mesh_tris[:, 0], mesh_tris[:, 1], mesh_tris[:, 2], lp, lv)
  return _RAY_FUNC[GeomType(geomtype)](size, lp, lv)


def _candidate_geoms(m: Model, geomgroup, flg_static, bodyexclude) -> np.ndarray:
  """Host-side filter (reference precompute_ray_data, ray.py:292-324)."""
  ids = []
  for g in range(m.ngeom):
    b = int(m.geom_bodyid[g])
    if b == bodyexclude:
      continue
    if not flg_static and int(m.body_weldid[b]) == 0:
      continue
    if geomgroup is not None:
      grp = min(max(int(m.geom_group[g]), 0), 5)
      if not geomgroup[grp]:
        continue
    ids.append(g)
  return np.array(ids, dtype=np.int64)


def ray(
    m: Model,
    d: Data,
    pnt: jax.Array,
    vec: jax.Array,
    geomgroup=None,
    flg_static: bool = True,
    bodyexclude: int = -1,
):
  """Casts a ray through the scene (mj_ray): returns (dist, geom_id).

  dist is -1 and geom_id is -1 when nothing is hit.  Candidate filtering is
  static; per-geom intersections group by type and vmap."""
  dtype = d.qpos.dtype
  ids = _candidate_geoms(m, geomgroup, flg_static, bodyexclude)
  if len(ids) == 0:
    return jnp.asarray(-1.0, dtype), jnp.asarray(-1, jnp.int32)

  dists = []
  gids = []
  for g in ids:
    gt = int(m.geom_type[g])
    tris = None
    if gt == GeomType.MESH:
      mid = int(m.geom_dataid[g])
      fa, fn_ = int(m.mesh_faceadr[mid]), int(m.mesh_facenum[mid])
      va = int(m.mesh_vertadr[mid])
      faces = m.mesh_face[fa : fa + fn_]
      tris = jnp.asarray(m.mesh_vert[va + faces], dtype=dtype)  # (nf, 3, 3)
    t = ray_geom(
        d.geom_xpos[g], d.geom_xmat[g], m.geom_size[g], pnt, vec, gt, tris
    )
    dists.append(t)
    gids.append(g)

  dists = jnp.stack(dists)
  best = jnp.argmin(dists)
  dist = dists[best]
  geom_id = jnp.asarray(np.array(gids), jnp.int32)[best]
  hit = jnp.isfinite(dist)
  return (
      jnp.where(hit, dist, -1.0).astype(dtype),
      jnp.where(hit, geom_id, -1).astype(jnp.int32),
  )
