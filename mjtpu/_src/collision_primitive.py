"""Primitive narrowphase collision functions.

Reference capability map: mujoco_torch/_src/collision_primitive.py:41-231
(plane/sphere, plane/capsule, sphere/sphere, sphere/capsule,
capsule/capsule).  Each function takes world poses/sizes of the two geoms
(traced; vmapped per candidate group by the driver) and returns
(dist (n,), pos (n, 3), frame (n, 3, 3)) with the contact normal pointing
from geom1 into geom2 (MuJoCo convention).  Verified against mj_collision
in tests/test_collision.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjtpu._src import math


def _sphere_sphere_raw(p1, r1, p2, r2):
  """Contact between two spheres given centers/radii."""
  n, dist_c = math.normalize_with_norm(p2 - p1)
  # degenerate (coincident centers): arbitrary z normal, like MuJoCo
  n = jnp.where(dist_c == 0.0, jnp.array([0.0, 0.0, 1.0], dtype=p1.dtype), n)
  dist = dist_c - (r1 + r2)
  pos = p1 + n * (r1 + 0.5 * dist)
  return dist, pos, math.make_frame(n)


def plane_sphere(pos1, mat1, size1, pos2, mat2, size2):
  n = mat1[:, 2]
  dist = jnp.dot(n, pos2 - pos1) - size2[0]
  pos = pos2 - n * (size2[0] + 0.5 * dist)
  return dist[None], pos[None], math.make_frame(n)[None]


def plane_capsule(pos1, mat1, size1, pos2, mat2, size2):
  n = mat1[:, 2]
  axis = mat2[:, 2]
  r, h = size2[0], size2[1]
  # mj's plane-capsule frame: first tangent is the capsule axis projected
  # onto the plane (matters for pyramidal cone orientation under sliding)
  t1 = axis - n * jnp.dot(n, axis)
  t1n = math.safe_norm(t1)
  frame_fallback = math.make_frame(n)
  t1 = jnp.where(t1n < 1e-12, frame_fallback[1], t1 / jnp.maximum(1e-12, t1n))
  t2 = jnp.cross(n, t1)
  frame = jnp.stack([n, t1, t2])
  dists, poss = [], []
  for sgn in (-1.0, 1.0):
    center = pos2 + sgn * h * axis
    dist = jnp.dot(n, center - pos1) - r
    pos = center - n * (r + 0.5 * dist)
    dists.append(dist)
    poss.append(pos)
  return (
      jnp.stack(dists),
      jnp.stack(poss),
      jnp.stack([frame, frame]),
  )


def sphere_sphere(pos1, mat1, size1, pos2, mat2, size2):
  dist, pos, frame = _sphere_sphere_raw(pos1, size1[0], pos2, size2[0])
  return dist[None], pos[None], frame[None]


def sphere_capsule(pos1, mat1, size1, pos2, mat2, size2):
  axis = mat2[:, 2]
  h = size2[1]
  pt = math.closest_segment_point(pos2 - h * axis, pos2 + h * axis, pos1)
  dist, pos, frame = _sphere_sphere_raw(pos1, size1[0], pt, size2[0])
  return dist[None], pos[None], frame[None]


def capsule_capsule(pos1, mat1, size1, pos2, mat2, size2):
  axis1, axis2 = mat1[:, 2], mat2[:, 2]
  h1, h2 = size1[1], size2[1]
  p1, p2 = math.closest_segment_to_segment_points(
      pos1 - h1 * axis1,
      pos1 + h1 * axis1,
      pos2 - h2 * axis2,
      pos2 + h2 * axis2,
  )
  dist, pos, frame = _sphere_sphere_raw(p1, size1[0], p2, size2[0])
  return dist[None], pos[None], frame[None]


def _soft_where(cond_margin, k, a, b):
  """where(cond_margin > 0, a, b); sigmoid-blended in diff mode (the same
  case-blending convention as collision_convex._blend)."""
  if k is None:
    return jnp.where(cond_margin > 0, a, b)
  return math.sigmoid_blend(cond_margin, a, b, k)


def plane_ellipsoid(pos1, mat1, size1, pos2, mat2, size2):
  """One contact between a plane and an ellipsoid (mjc semantics: the
  support point of the ellipsoid along the inward plane normal).

  Capability-plus vs the reference, which ships this collider unregistered
  (reference collision_primitive.py:77-85, dead code — SURVEY.md §2.4)."""
  n = mat1[:, 2]
  n_local = mat2.T @ n
  support = -math.normalize(n_local * size2) * size2   # deepest point, local
  pos = pos2 + mat2 @ support
  dist = jnp.dot(n, pos - pos1)
  pos = pos - n * dist * 0.5
  return dist[None], pos[None], math.make_frame(n)[None]


def plane_cylinder(pos1, mat1, size1, pos2, mat2, size2):
  """Up to four contacts between a plane and a cylinder, matching MuJoCo C
  (oracle-probed): the deepest cap-rim point, the same rim point on the
  opposite cap (line contact when lying), and two +-120-degree flanking
  rim points on the deep cap (disk contact when upright).  All four slots
  are computed unconditionally and gate on penetration in the constraint
  layer — no case switch, so the geometry is differentiable as-is.

  Capability-plus vs the reference, which ships a 3-slot threshold-switch
  version as unregistered dead code (collision_primitive.py:88-170); the
  threshold branch deviates from C for moderately tilted lying cylinders."""
  from mjtpu._src.collision_convex import _smooth_k

  k = _smooth_k()
  dtype = pos1.dtype
  r, h = size2[0], size2[1]
  n = mat1[:, 2]
  axis = mat2[:, 2]

  # orient the axis toward the plane (prjaxis <= 0 after the flip)
  prjaxis0 = jnp.dot(n, axis)
  sign = -_soft_where(prjaxis0, k, jnp.ones((), dtype), -jnp.ones((), dtype))
  axis = axis * sign
  prjaxis = prjaxis0 * sign

  dist0 = jnp.dot(pos2 - pos1, n)

  # radial direction of the deepest rim point: -normal with its axial
  # component removed (degenerate when the axis is plane-perpendicular)
  vec = axis * prjaxis - n
  len_ = math.safe_norm(vec)
  vec = _soft_where(
      len_ - 1e-12, k, vec / jnp.maximum(1e-12, len_) * r, mat2[:, 0] * r
  )
  prjvec = jnp.dot(vec, n)

  axis_h = axis * h
  prjaxis_h = prjaxis * h
  # flanking rim points at +-120 degrees around the deep cap disk
  prjvec1 = -prjvec * 0.5
  vec1 = math.normalize(jnp.cross(vec, axis)) * r * (jnp.sqrt(3.0) * 0.5)

  d1 = dist0 + prjaxis_h + prjvec   # deep-cap rim
  d2 = dist0 + prjaxis_h + prjvec1  # flanks on the deep cap
  d3 = dist0 - prjaxis_h + prjvec   # opposite-cap rim (lying cylinders)
  deep = pos2 + axis_h
  dist = jnp.stack([d1, d3, d2, d2])
  pos = jnp.stack([
      deep + vec - n * d1 * 0.5,
      pos2 - axis_h + vec - n * d3 * 0.5,
      deep + vec1 - vec * 0.5 - n * d2 * 0.5,
      deep - vec1 - vec * 0.5 - n * d2 * 0.5,
  ])
  frame = math.make_frame(n)
  return dist, pos, jnp.stack([frame] * 4)


def sphere_cylinder(pos1, mat1, size1, pos2, mat2, size2):
  """One contact between a sphere (geom1) and a cylinder (geom2), matching
  MuJoCo C's analytic closest-point-on-solid-cylinder collider
  (oracle-probed on side/cap/rim and interior cases).

  Capability-plus vs the reference (no sphere-cylinder support there)."""
  from mjtpu._src.collision_convex import _smooth_k

  k = _smooth_k()
  dtype = pos1.dtype
  r_s = size1[0]
  r_c, h = size2[0], size2[1]

  c = mat2.T @ (pos1 - pos2)  # sphere center, cylinder local
  rho_vec = c.at[2].set(0.0)
  rho = math.safe_norm(rho_vec)
  rho_hat = _soft_where(
      rho - 1e-12, k,
      rho_vec / jnp.maximum(1e-12, rho),
      jnp.array([1.0, 0.0, 0.0], dtype),
  )
  z = c[2]

  # --- outside: clamp to the solid cylinder ---
  p_out = rho_hat * jnp.minimum(rho, r_c)
  p_out = p_out.at[2].set(jnp.clip(z, -h, h))
  u = c - p_out
  u_len = math.safe_norm(u)
  u_hat = _soft_where(
      u_len - 1e-12, k, u / jnp.maximum(1e-12, u_len), rho_hat
  )
  dist_out = u_len - r_s

  # --- inside: push out through the nearer of side wall / cap ---
  gap_side = r_c - rho
  gap_cap = h - jnp.abs(z)
  use_side = gap_cap - gap_side  # > 0: the side wall is nearer
  cap_n = jnp.array([0.0, 0.0, 1.0], dtype) * _soft_where(
      z, k, jnp.ones((), dtype), -jnp.ones((), dtype)
  )
  n_in = _soft_where(use_side, k, rho_hat, cap_n)
  dist_in = -(jnp.minimum(gap_side, gap_cap) + r_s)
  p_in_side = rho_hat * r_c
  p_in_side = p_in_side.at[2].set(z)
  p_in_cap = c.at[2].set(
      h * _soft_where(z, k, jnp.ones((), dtype), -jnp.ones((), dtype))
  )
  p_in = _soft_where(use_side, k, p_in_side, p_in_cap)

  inside = jnp.minimum(gap_side, gap_cap)  # > 0 iff center inside
  dist = _soft_where(inside, k, dist_in, dist_out)
  n_out_local = _soft_where(inside, k, n_in, u_hat)
  p_surf = _soft_where(inside, k, p_in, p_out)
  pos_local = p_surf + 0.5 * dist * n_out_local

  pos = pos2 + mat2 @ pos_local
  # contact normal points from geom1 (sphere) into geom2 (cylinder)
  n_world = -(mat2 @ n_out_local)
  return dist[None], pos[None], math.make_frame(n_world)[None]
