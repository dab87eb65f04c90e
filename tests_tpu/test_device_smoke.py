"""On-device smoke tests (f32, real TPU): the engine steps finite, the
auto-gated Pallas kernels engage, and the vmap batch scales.

These complement tests/ (CPU f64 parity vs MuJoCo C): here the oracle is
only finiteness/shape sanity — numerics are covered by the parity suite —
but the code path is the production one (f32, bf16_3x matmuls, Pallas
Cholesky/SAT/hfield kernels on).
"""

import pathlib

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mjtpu

ASSETS = pathlib.Path(mjtpu.__file__).parent / "zoo" / "assets"


def _batch(mjm, m, batch, seed=0):
  d0 = mjtpu.make_data(m)
  rng = np.random.default_rng(seed)
  qpos = jnp.asarray(
      mjm.qpos0[None] + rng.uniform(-0.01, 0.01, (batch, mjm.nq)),
      jnp.float32)
  return jax.vmap(lambda q: d0.replace(qpos=q))(qpos)


def test_step_finite_on_device():
  """humanoid_bench, B=256, 100 steps: finite, zero auto-resets."""
  mjm = mujoco.MjModel.from_xml_path(str(ASSETS / "humanoid_bench.xml"))
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d = _batch(mjm, m, 256)
  step = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))
  for _ in range(100):
    d = step(m, d)
  assert bool(jnp.isfinite(d.qpos).all())
  assert int(d.nreset.sum()) == 0


def test_auto_kernel_gates_engage():
  """The trace-time gates report engaged on this backend (the production
  default): a rename/regression that silently falls back to the jnp paths
  fails here, not in a slow benchmark."""
  from mjtpu._src import collision_convex, collision_hfield
  from mjtpu._src import mesh as mesh_mod

  assert jax.default_backend() == "tpu"
  hull = mesh_mod.box(np.array([0.1, 0.1, 0.1]))
  assert collision_convex._sat_kernel_enabled(hull, hull, jnp.float32)
  assert collision_hfield._kernel_enabled(2, 2, jnp.float32)


def test_terrain_step_with_hfield_kernel():
  """humanoid_terrain (hfield + mesh collisions) steps finite with the
  hfield kernel auto-engaged."""
  mjm = mujoco.MjModel.from_xml_path(str(ASSETS / "humanoid_terrain.xml"))
  mjtpu.procedural_terrain(mjm)
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d = _batch(mjm, m, 128)
  step = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))
  for _ in range(100):
    d = step(m, d)
  assert bool(jnp.isfinite(d.qpos).all())
