"""Pallas hfield narrowphase kernel vs the jnp reference path.

The kernel (mjtpu/ops/hfield.py) runs the surface-triangle manifold stage
of hfield-sphere/capsule collision; these tests force it on the CPU
backend via MJTPU_PALLAS_HFIELD=1 (interpret mode) and pin it against the
jnp path (collision_hfield._manifold_jnp) — manifold distances/positions/
normals to f32 roundoff — plus full terrain trajectories through
mjtpu.step.  Reference workload: mujoco_torch/_src/collision_hfield.py
:227-291 (prism construction) and :352-390 (dispatch).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu
from mjtpu._src import collision_hfield as ch


@pytest.fixture
def hfield_on(monkeypatch):
  monkeypatch.setenv("MJTPU_PALLAS_HFIELD", "1")


def _random_cases(rng, n, hy, hx, dx, dy, has_axis):
  rr, cc = 2 * hy + 2, 2 * hx + 2
  zwin = jnp.asarray(rng.uniform(0.0, 0.15, (n, rr, cc)), jnp.float32)
  origin = jnp.asarray(
      rng.uniform(-1.0, 1.0, (n, 2)), jnp.float32)
  # object near the window center, hovering around the surface band
  cx = origin[:, 0] + (cc - 1) / 2 * dx
  cy = origin[:, 1] + (rr - 1) / 2 * dy
  center = jnp.stack(
      [cx + jnp.asarray(rng.uniform(-dx, dx, n), jnp.float32),
       cy + jnp.asarray(rng.uniform(-dy, dy, n), jnp.float32),
       jnp.asarray(rng.uniform(0.0, 0.3, n), jnp.float32)], axis=1)
  if has_axis:
    ax = rng.normal(size=(n, 3))
    ax /= np.linalg.norm(ax, axis=1, keepdims=True)
    h = jnp.asarray(rng.uniform(0.05, 0.3, (n, 1)), jnp.float32)
    a = center - h * jnp.asarray(ax, jnp.float32)
    b = center + h * jnp.asarray(ax, jnp.float32)
  else:
    a = b = center
  r = jnp.asarray(rng.uniform(0.02, 0.12, n), jnp.float32)
  return zwin, origin, a, b, r


@pytest.mark.parametrize("has_axis", [False, True],
                         ids=["sphere", "capsule"])
@pytest.mark.parametrize("hy,hx", [(2, 2), (1, 3)])
def test_manifold_matches_jnp(has_axis, hy, hx):
  """Kernel (interpret) vs jnp manifold on 256 random windows/poses."""
  from mjtpu.ops import hfield as hf

  dx, dy = 0.21, 0.17
  rng = np.random.default_rng(42 + hy * 10 + has_axis)
  zwin, origin, a, b, r = _random_cases(rng, 256, hy, hx, dx, dy, has_axis)

  kd, kp, kn = hf.manifold_batch(zwin, origin, a, b, r, hy, hx, dx, dy,
                                 has_axis, interpret=True)

  jd, jp, jn = jax.vmap(
      lambda zw, og, aa, bb, rr: ch._manifold_jnp(
          zw, og, aa, bb, rr, dx, dy, has_axis)
  )(zwin, origin, a, b, r)

  # dist is the load-bearing scalar: tight bound, every element
  np.testing.assert_allclose(np.asarray(kd), np.asarray(jd),
                             atol=5e-6, rtol=1e-5)
  # vector outputs amplify roundoff near ties: the capsule reference-point
  # choice (d1 <= d2) and n = normalize(p - closest) both switch on
  # quantities that agree only to f32 ULP between Mosaic and XLA op
  # orders, so isolated contacts pick a different-but-equally-deep
  # direction (dist above already pinned equal).  Require: 99.5% of
  # elements bitwise-close, and NO gross flips anywhere.
  for got, want in ((kp, jp), (kn, jn)):
    err = np.abs(np.asarray(got) - np.asarray(want))
    frac = (err > 1e-3).mean()
    assert frac <= 0.005, f"vector mismatch fraction {frac:.4f}"
    assert err.max() < 0.1, f"gross vector mismatch: {err.max()}"


TERRAIN_XML = """<mujoco>
  <asset><hfield name="hf" nrow="16" ncol="16" size="2 2 0.2 0.05"/></asset>
  <worldbody>
    <geom type="hfield" hfield="hf"/>
    <body pos="0.1 -0.2 0.35"><freejoint/>
      <geom type="sphere" size="0.1"/></body>
    <body pos="-0.4 0.3 0.4"><freejoint/>
      <geom type="capsule" size="0.06 0.15" euler="0 70 20"/></body>
  </worldbody>
</mujoco>"""


def _terrain_model():
  mjm = mujoco.MjModel.from_xml_string(TERRAIN_XML)
  rng = np.random.default_rng(3)
  mjm.hfield_data[:] = rng.uniform(0.0, 1.0, mjm.hfield_data.shape)
  return mjm


def test_step_trajectory_kernel_vs_jnp(hfield_on):
  """Full f32 rollout (sphere + capsule on random terrain): kernel path vs
  MJTPU_PALLAS_HFIELD=0 jnp path stay close through contact events."""
  mjm = _terrain_model()
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d0 = mjtpu.make_data(m)

  batch = 4
  rng = np.random.default_rng(0)
  qpos = jnp.asarray(
      mjm.qpos0[None] + rng.uniform(-0.05, 0.05, (batch, mjm.nq)),
      jnp.float32)
  dk = jax.vmap(lambda q: d0.replace(qpos=q))(qpos)
  step = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))
  for _ in range(100):
    dk = step(m, dk)

  import os

  os.environ["MJTPU_PALLAS_HFIELD"] = "0"
  try:
    dj = jax.vmap(lambda q: d0.replace(qpos=q))(qpos)
    step_j = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))
    for _ in range(100):
      dj = step_j(m, dj)
  finally:
    os.environ["MJTPU_PALLAS_HFIELD"] = "1"

  qk, qj = np.asarray(dk.qpos), np.asarray(dj.qpos)
  assert np.isfinite(qk).all()
  # f32 rollouts through contact: identical math modulo Mosaic-vs-XLA
  # rounding; trajectories must not diverge measurably in 100 steps
  np.testing.assert_allclose(qk, qj, atol=5e-3)


def test_fwd_position_contacts_match(hfield_on):
  """Single fwd_position: kernel-path contacts equal jnp-path contacts."""
  mjm = _terrain_model()
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d0 = mjtpu.make_data(m)
  rng = np.random.default_rng(1)
  qpos = jnp.asarray(
      mjm.qpos0[None] + rng.uniform(-0.08, 0.08, (8, mjm.nq)), jnp.float32)
  batch = jax.vmap(lambda q: d0.replace(qpos=q))(qpos)

  fwd = jax.jit(jax.vmap(mjtpu.fwd_position, in_axes=(None, 0)))
  dk = fwd(m, batch)

  import os

  os.environ["MJTPU_PALLAS_HFIELD"] = "0"
  try:
    fwd_j = jax.jit(jax.vmap(mjtpu.fwd_position, in_axes=(None, 0)))
    dj = fwd_j(m, batch)
  finally:
    os.environ["MJTPU_PALLAS_HFIELD"] = "1"

  np.testing.assert_allclose(np.asarray(dk.contact.dist),
                             np.asarray(dj.contact.dist), atol=1e-5)
  np.testing.assert_allclose(np.asarray(dk.contact.pos),
                             np.asarray(dj.contact.pos), atol=1e-5)
  np.testing.assert_allclose(np.asarray(dk.contact.frame),
                             np.asarray(dj.contact.frame), atol=1e-4)
