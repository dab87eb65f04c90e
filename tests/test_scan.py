"""scan.flat / scan.body_tree unit tests (reference test/scan_test.py)."""

import jax.numpy as jnp
import numpy as np

import mjtpu
from mjtpu._src import scan
from tests.conftest import load_mj


def test_body_tree_forward_depth_sum():
  """Forward scan accumulates parent values root-to-leaf."""
  mjm = load_mj("ball_free.xml")
  m = mjtpu.put_model(mjm)

  def fn(carry, mass):
    depth = jnp.zeros(()) if carry is None else carry + 1.0
    return depth

  depth = scan.body_tree(m, fn, "b", "b", m.body_mass)
  parent = np.asarray(m.body_parentid)
  expect = np.zeros(m.nbody)
  for b in range(1, m.nbody):
    expect[b] = expect[parent[b]] + 1
  np.testing.assert_allclose(np.asarray(depth), expect)


def test_body_tree_reverse_subtree_sum():
  """Reverse scan accumulates child sums leaf-to-root (subtree mass)."""
  mjm = load_mj("ball_free.xml")
  m = mjtpu.put_model(mjm)

  def fn(carry, mass):
    return mass if carry is None else mass + carry

  subtree = scan.body_tree(m, fn, "b", "b", m.body_mass, reverse=True)
  np.testing.assert_allclose(
      np.asarray(subtree), np.asarray(m.body_subtreemass), atol=1e-12
  )


def test_flat_qpos_passthrough():
  """flat gathers per-body qpos segments and scatters outputs back."""
  mjm = load_mj("ball_free.xml")
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)

  qpos = scan.flat(m, lambda jt, q: 2.0 * q, "jq", "q", np.asarray(m.jnt_type), d.qpos)
  np.testing.assert_allclose(np.asarray(qpos), 2.0 * np.asarray(d.qpos))


def test_segment_sum():
  out = scan.segment_sum(jnp.arange(6.0), np.array([0, 0, 1, 1, 2, 2]), 3)
  np.testing.assert_allclose(np.asarray(out), [1.0, 5.0, 9.0])
