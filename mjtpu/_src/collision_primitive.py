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
