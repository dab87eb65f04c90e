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
