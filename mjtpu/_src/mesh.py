"""Host-side convex hull processing for mesh/box collisions.

Reference capability map: mujoco_torch/_src/mesh.py (trimesh-based hull
re-merging).  This build derives hulls with scipy.spatial.ConvexHull and
merges coplanar triangles into polygonal faces in pure numpy (trimesh is not
available in the TPU image, and the outputs are trace-time constants anyway —
they get baked into the collision kernels per mesh-shape group).

All outputs are padded, fixed-shape numpy arrays:
  vert             (nvert, 3)
  face             (nface, max_face_vert) vertex indices (padded by repeating)
  face_normal      (nface, 3)
  edge             (nedge, 2) unique hull edges
  edge_face_normal (nedge, 2, 3) normals of the two faces adjacent to edge
"""

from __future__ import annotations

import itertools

import numpy as np
from scipy.spatial import ConvexHull  # host-side only, never inside jit

from mjtpu._src import types


def _merge_coplanar(hull: ConvexHull) -> tuple[np.ndarray, np.ndarray, list[list[int]]]:
  """Merges coplanar hull triangles into polygons.

  Returns (vert, face_normal, faces) where faces is a list of CCW-ordered
  vertex-index lists into vert.
  """
  pts = hull.points
  # group triangles by quantized normal (a convex hull has at most one face
  # per outward normal)
  keys = np.round(hull.equations[:, :3] / np.maximum(
      np.linalg.norm(hull.equations[:, :3], axis=1, keepdims=True), 1e-12), 5)
  groups: dict[tuple, list[int]] = {}
  for i, k in enumerate(map(tuple, keys)):
    groups.setdefault(k, []).append(i)

  # compact vertex set: only hull vertices
  used = np.unique(hull.simplices)
  remap = -np.ones(len(pts), dtype=np.int64)
  remap[used] = np.arange(len(used))
  vert = pts[used]

  faces, normals = [], []
  for tri_ids in groups.values():
    vids = np.unique(hull.simplices[np.array(tri_ids)])
    n = hull.equations[tri_ids[0], :3]
    n = n / max(np.linalg.norm(n), 1e-12)
    # order polygon vertices CCW about the outward normal
    c = pts[vids].mean(axis=0)
    # plane basis
    ref = np.array([1.0, 0.0, 0.0]) if abs(n[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    u = np.cross(n, ref)
    u /= max(np.linalg.norm(u), 1e-12)
    v = np.cross(n, u)
    ang = np.arctan2((pts[vids] - c) @ v, (pts[vids] - c) @ u)
    order = np.argsort(ang)
    faces.append([int(remap[i]) for i in vids[order]])
    normals.append(n)
  return vert, np.array(normals), faces


def _edges_and_adjacent_normals(
    faces: list[list[int]], normals: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
  """Unique undirected edges of the polygon soup + their two face normals."""
  edge_faces: dict[tuple[int, int], list[int]] = {}
  for fi, f in enumerate(faces):
    for a, b in zip(f, f[1:] + f[:1]):
      if a == b:
        continue
      k = (min(a, b), max(a, b))
      edge_faces.setdefault(k, []).append(fi)
  edges, efn = [], []
  for (a, b), fids in edge_faces.items():
    edges.append((a, b))
    n0 = normals[fids[0]]
    n1 = normals[fids[1]] if len(fids) > 1 else n0
    efn.append((n0, n1))
  return np.array(edges, dtype=np.int64), np.array(efn)


def _pad_faces(faces: list[list[int]]) -> np.ndarray:
  maxv = max(len(f) for f in faces)
  out = np.zeros((len(faces), maxv), dtype=np.int64)
  for i, f in enumerate(faces):
    out[i, : len(f)] = f
    out[i, len(f):] = f[-1]  # pad by repeating the last vertex
  return out


def convex(vert: np.ndarray) -> types.ConvexMesh:
  """Builds ConvexMesh hull data from a point cloud (host-side)."""
  hull = ConvexHull(np.asarray(vert, dtype=np.float64))
  v, normals, faces = _merge_coplanar(hull)
  edge, efn = _edges_and_adjacent_normals(faces, normals)
  return types.ConvexMesh(
      vert=v,
      face=_pad_faces(faces),
      face_normal=normals,
      edge=edge,
      edge_face_normal=efn,
  )


def box(size: np.ndarray) -> types.ConvexMesh:
  """Analytic axis-aligned box hull with half-sizes `size` (3,)."""
  corners = np.array(list(itertools.product([-1.0, 1.0], repeat=3))) * size
  return convex(corners)


def hfield_prism(verts: np.ndarray) -> types.ConvexMesh:
  """Hull of a 6-vertex triangular prism (used by hfield collisions)."""
  return convex(np.asarray(verts, dtype=np.float64))


def cylinder(size: np.ndarray, nseg: int = 16) -> types.ConvexMesh:
  """Discretized cylinder hull: radius size[0], half-height size[1].

  Non-plane/sphere cylinder collisions route through the convex SAT path on
  a trace-time hull (the same approach MJX takes; MuJoCo C uses MPR).  The
  hull is inscribed, so contact depth is shallower than the true surface by
  at most r*(1-cos(pi/nseg)) (~1.9% of r at nseg=16).
  """
  ang = np.arange(nseg) * (2.0 * np.pi / nseg)
  ring = np.stack([np.cos(ang), np.sin(ang)], axis=-1) * float(size[0])
  h = float(size[1])
  pts = np.concatenate([
      np.concatenate([ring, np.full((nseg, 1), -h)], axis=-1),
      np.concatenate([ring, np.full((nseg, 1), h)], axis=-1),
  ])
  return convex(pts)


def ellipsoid(size: np.ndarray, nvert: int = 32) -> types.ConvexMesh:
  """Discretized ellipsoid hull: Fibonacci sphere scaled by the radii.

  Same inscribed-hull caveat as cylinder(); all hull faces are triangles.
  """
  i = np.arange(nvert)
  phi = np.arccos(1.0 - 2.0 * (i + 0.5) / nvert)
  theta = np.pi * (1.0 + np.sqrt(5.0)) * i
  pts = np.stack([
      np.sin(phi) * np.cos(theta),
      np.sin(phi) * np.sin(theta),
      np.cos(phi),
  ], axis=-1)
  return convex(pts * np.asarray(size, dtype=np.float64))


def get(m: "mujoco.MjModel") -> tuple:
  """Per-mesh ConvexMesh tuple for all meshes referenced by colliding geoms.

  Mirrors the role of mujoco_torch/_src/mesh.py:get — meshes not used for
  collision get None (saving hull work); box hulls are built on demand by
  the collision functions.
  """
  import mujoco

  needed = set()
  for g in range(m.ngeom):
    if m.geom_type[g] == mujoco.mjtGeom.mjGEOM_MESH and (
        m.geom_contype[g] or m.geom_conaffinity[g]
    ):
      needed.add(int(m.geom_dataid[g]))
  out = []
  for i in range(m.nmesh):
    if i in needed:
      va, vn = int(m.mesh_vertadr[i]), int(m.mesh_vertnum[i])
      out.append(convex(m.mesh_vert[va : va + vn]))
    else:
      out.append(None)
  return tuple(out)
