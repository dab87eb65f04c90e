"""Pallas SAT narrowphase kernel vs the jnp reference path.

The kernel (mjtpu/ops/sat.py) runs the SAT axis-enumeration stage of
convex-convex collision; these tests force it on the CPU backend via
MJTPU_PALLAS_SAT=1 (interpret mode) and pin it against the jnp path
(collision_convex._sat_winners_jnp) — winner indices exactly, contacts to
f32 roundoff, and full box-pile trajectories through mjtpu.step.
Reference workload: mujoco_torch/_src/collision_convex.py:330-601.
"""

import os

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu
from mjtpu._src import collision_convex as cc
from mjtpu._src import mesh


def _rand_rot(rng, n):
  q = rng.normal(size=(n, 4))
  q /= np.linalg.norm(q, axis=1, keepdims=True)
  w, x, y, z = q.T
  return np.stack([
      1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
      2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
      2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
  ], axis=1).reshape(n, 3, 3)


def _poses(rng, n, sep):
  pos1 = jnp.asarray(rng.uniform(-0.05, 0.05, (n, 3)), jnp.float32)
  pos2 = jnp.asarray(
      rng.uniform(-0.05, 0.05, (n, 3)) + [sep, 0, 0], jnp.float32)
  m1 = jnp.asarray(_rand_rot(rng, n), jnp.float32)
  m2 = jnp.asarray(_rand_rot(rng, n), jnp.float32)
  return pos1, m1, pos2, m2


@pytest.fixture
def sat_on(monkeypatch):
  monkeypatch.setenv("MJTPU_PALLAS_SAT", "1")


HULL_PAIRS = {
    "box_box": (mesh.box(np.array([0.1, 0.15, 0.2])),
                mesh.box(np.array([0.12, 0.1, 0.08]))),
    "box_cyl": (mesh.box(np.array([0.1, 0.15, 0.2])),
                mesh.cylinder(np.array([0.1, 0.15, 0.0]))),
}


@pytest.mark.parametrize("pair", list(HULL_PAIRS))
@pytest.mark.parametrize("sep", [0.05, 0.3])
def test_sat_winners_match_jnp(sat_on, pair, sep):
  """Winner indices bitwise, separations to f32 roundoff — 150 poses."""
  from mjtpu.ops import sat

  h1, h2 = HULL_PAIRS[pair]
  rng = np.random.default_rng(hash((pair, sep)) % 2**31)
  pos1, m1, pos2, m2 = _poses(rng, 150, sep)
  rs, ri = jax.vmap(
      lambda a, b, c, d: cc._sat_winners_jnp(a, b, c, d, h1, h2)
  )(pos1, m1, pos2, m2)
  seps, idx = sat.sat_winners_batch(pos1, m1, pos2, m2, h1, h2,
                                    interpret=True)
  np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))
  np.testing.assert_allclose(np.asarray(seps), np.asarray(rs),
                             atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("sep", [0.05, 0.3])
def test_convex_convex_contacts_match(sat_on, sep):
  """Full contacts through the double-vmap seam (envs x pairs, both
  non-multiples of the 128 lane tile)."""
  h1, h2 = HULL_PAIRS["box_box"]
  rng = np.random.default_rng(3)
  B, n = 5, 3
  args = [x.reshape((B, n) + x.shape[1:])
          for x in _poses(rng, B * n, sep)]
  sz = jnp.zeros(3, jnp.float32)
  fn = lambda p1, m1, p2, m2: cc.convex_convex(p1, m1, sz, p2, m2, sz, h1, h2)
  out_k = jax.jit(jax.vmap(jax.vmap(fn)))(*args)
  os.environ["MJTPU_PALLAS_SAT"] = "0"
  try:
    out_j = jax.jit(jax.vmap(jax.vmap(
        lambda p1, m1, p2, m2: cc.convex_convex(
            p1, m1, sz, p2, m2, sz, h1, h2))))(*args)
  finally:
    os.environ["MJTPU_PALLAS_SAT"] = "1"
  for a, b in zip(out_k, out_j):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-5)


_PILE_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="2 2 .1"/>
    <body pos="0 0 0.15"><freejoint/>
      <geom type="box" size=".1 .08 .06" mass="0.3" euler="10 20 5"/></body>
    <body pos="0.05 0.02 0.4"><freejoint/>
      <geom type="box" size=".07 .09 .05" mass="0.2" euler="40 5 70"/></body>
    <body pos="-0.04 -0.03 0.65"><freejoint/>
      <geom type="box" size=".06 .06 .08" mass="0.25" euler="80 30 10"/></body>
  </worldbody>
</mujoco>
"""


def test_box_pile_trajectory_matches(sat_on):
  """50 steps of a 3-box pile, kernel vs jnp path, f32, B=4."""
  mjm = mujoco.MjModel.from_xml_string(_PILE_XML)
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d0 = mjtpu.make_data(m)
  rng = np.random.default_rng(0)
  qpos = jnp.asarray(
      mjm.qpos0[None] + rng.uniform(-0.01, 0.01, (4, mjm.nq)), jnp.float32)
  batch = jax.vmap(lambda q: d0.replace(qpos=q))(qpos)

  def run():
    step = jax.jit(jax.vmap(lambda m_, d_: mjtpu.step(m_, d_),
                            in_axes=(None, 0)))
    d = batch
    for _ in range(50):
      d = step(m, d)
    return np.asarray(d.qpos), np.asarray(d.qvel)

  qk, vk = run()
  os.environ["MJTPU_PALLAS_SAT"] = "0"
  try:
    qj, vj = run()
  finally:
    os.environ["MJTPU_PALLAS_SAT"] = "1"
  assert np.isfinite(qk).all()
  np.testing.assert_allclose(qk, qj, atol=1e-5)
  np.testing.assert_allclose(vk, vj, atol=1e-4)


def test_gate_fallbacks(sat_on):
  """f64 and oversized hulls fall back to the jnp path without error."""
  h_ell = mesh.ellipsoid(np.array([0.1, 0.2, 0.3]))
  h_box = HULL_PAIRS["box_box"][0]
  # ellipsoid-ellipsoid exceeds the VMEM budget -> gated off
  assert not cc._sat_kernel_enabled(h_ell, h_ell, jnp.float32)
  # f64 -> gated off regardless of knob
  assert not cc._sat_kernel_enabled(h_box, h_box, jnp.float64)
  # f64 winners still run (jnp path) under the knob
  rng = np.random.default_rng(0)
  pos1, m1, pos2, m2 = (x.astype(jnp.float64) for x in _poses(rng, 2, 0.1))
  seps, idx = jax.vmap(
      lambda a, b, c, d: cc._sat_winners(a, b, c, d, h_box, h_box)
  )(pos1, m1, pos2, m2)
  assert seps.shape == (2, 3) and idx.shape == (2, 4)
