"""Convex-hull processing (reference test/mesh_test.py: coplanar-face
merging, face/edge tables, box hull)."""

import mujoco
import numpy as np

from mjtpu._src import mesh


def test_box_hull():
  h = mesh.box(np.array([0.1, 0.2, 0.3]))
  assert h.vert.shape == (8, 3)
  assert h.face.shape[0] == 6          # coplanar triangles merged to quads
  assert h.face_normal.shape == (6, 3)
  # face normals are +-axis unit vectors
  np.testing.assert_allclose(np.abs(h.face_normal).sum(axis=1), 1.0)
  np.testing.assert_allclose(np.linalg.norm(h.face_normal, axis=1), 1.0)
  # every vertex at the corner radius
  np.testing.assert_allclose(np.abs(h.vert), [[0.1, 0.2, 0.3]] * 8)
  # edges: a box has 12
  assert h.edge.shape[0] == 12


def test_convex_tetra():
  vert = np.array(
      [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
  )
  h = mesh.convex(vert)
  assert h.vert.shape == (4, 3)
  assert h.face.shape[0] == 4
  assert h.edge.shape[0] == 6
  # outward normals: each face normal points away from the centroid
  c = vert.mean(axis=0)
  for f in range(4):
    fv = h.vert[h.face[f]]
    assert np.dot(h.face_normal[f], fv[0] - c) > 0


def test_mesh_model_roundtrip():
  """A mesh geom loads through put_model and collides with a plane."""
  import jax.numpy as jnp
  import mjtpu

  xml = """
  <mujoco><asset>
    <mesh name="tet" vertex="0 0 0  .2 0 0  0 .2 0  0 0 .2"/>
  </asset><worldbody>
    <geom type="plane" size="2 2 .1"/>
    <body pos="0 0 .5"><freejoint/>
      <geom type="mesh" mesh="tet" mass="0.1"/></body>
  </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  for _ in range(200):
    d = mjtpu.step(m, d)
  q = np.asarray(d.qpos)
  assert np.isfinite(q).all()
  assert q[2] > -0.05  # settled on the plane, not fallen through
