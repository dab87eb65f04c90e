"""Env-batch sharding over a virtual 8-device CPU mesh (SURVEY.md §2.8 —
the multi-chip capability the reference lacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mjtpu
from mjtpu import parallel
from tests.conftest import load_mj


@pytest.fixture(scope="module")
def mesh8():
  if len(jax.devices()) < 8:
    pytest.skip("needs 8 (virtual) devices")
  return parallel.make_mesh(jax.devices()[:8])


def test_sharded_step_matches_unsharded(mesh8):
  mjm = load_mj("cartpole.xml")
  m = mjtpu.put_model(mjm)
  d0 = mjtpu.make_data(m)
  rng = np.random.default_rng(0)
  qpos = jnp.asarray(rng.uniform(-0.1, 0.1, (16, mjm.nq)))
  batch = jax.vmap(lambda q: d0.replace(qpos=q))(qpos)

  # unsharded reference
  ref = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))(m, batch)

  # sharded over the mesh
  m_rep = parallel.replicate_model(m, mesh8)
  batch_sh = parallel.shard_batch(batch, mesh8)
  step_fn = parallel.sharded_step(m_rep, mesh8)
  out = step_fn(batch_sh)

  np.testing.assert_allclose(
      np.asarray(out.qpos), np.asarray(ref.qpos), atol=1e-12
  )
  # output stays sharded over the env axis
  assert len(out.qpos.sharding.device_set) == 8


def test_sharded_rollout_stable(mesh8):
  mjm = load_mj("spheres.xml")
  m = parallel.replicate_model(mjtpu.put_model(mjm), mesh8)
  d0 = mjtpu.make_data(m)
  batch = jax.vmap(lambda i: d0)(jnp.arange(16))
  batch = parallel.shard_batch(batch, mesh8)
  step_fn = parallel.sharded_step(m, mesh8)
  for _ in range(50):
    batch = step_fn(batch)
  assert np.isfinite(np.asarray(batch.qpos)).all()


def test_randomized_sharded_rollout_matches_unsharded(mesh8):
  """Randomize x sharding composition (SURVEY.md §2.8 TPU-native column):
  a domain-randomized batched Model shards its per-env rows on the env
  axis alongside Data, and a multi-step sharded rollout matches the
  unsharded randomized rollout per env at 1e-12."""
  mjm = load_mj("cartpole.xml")
  m = mjtpu.put_model(mjm)
  B = 16
  rng = np.random.default_rng(7)
  mass = np.asarray(mjm.body_mass)[None] * rng.uniform(0.6, 1.4, (B, mjm.nbody))
  gain = np.tile(np.asarray(mjm.actuator_gainprm), (B, 1, 1))
  gain[:, :, 0] *= rng.uniform(0.8, 1.2, (B, mjm.nu))
  updates = {"body_mass": jnp.asarray(mass),
             "actuator_gainprm": jnp.asarray(gain)}

  d0 = mjtpu.make_data(m).replace(
      qpos=jnp.asarray(rng.uniform(-0.1, 0.1, mjm.nq)),
      ctrl=jnp.asarray(rng.uniform(-0.5, 0.5, mjm.nu)),
  )
  batch = jax.vmap(lambda _: d0)(jnp.arange(B))

  ref_step, _ = parallel.randomized_step(m, updates)
  ref = batch
  for _ in range(10):
    ref = ref_step(ref)

  step_fn, mb = parallel.sharded_randomized_step(m, updates, mesh8)
  # randomized Model leaves shard on the env axis; others replicate
  assert len(mb.body_mass.sharding.device_set) == 8
  assert not mb.body_mass.sharding.is_fully_replicated
  assert mb.qpos0.sharding.is_fully_replicated
  out = parallel.shard_batch(batch, mesh8)
  for _ in range(10):
    out = step_fn(out)

  np.testing.assert_allclose(
      np.asarray(out.qpos), np.asarray(ref.qpos), atol=1e-12
  )
  np.testing.assert_allclose(
      np.asarray(out.qvel), np.asarray(ref.qvel), atol=1e-12
  )
  assert len(out.qpos.sharding.device_set) == 8


# ----------------------------------------------------------------------------
# dispatch chunking (mjtpu.parallel.chunked_step)
# ----------------------------------------------------------------------------


def _make_batch(m, mjm, batch):
  d0 = mjtpu.make_data(m)
  rng = np.random.default_rng(3)
  qpos = jnp.asarray(mjm.qpos0[None] + rng.uniform(-0.05, 0.05, (batch, mjm.nq)))
  return jax.vmap(lambda q: d0.replace(qpos=q))(qpos)


@pytest.mark.parametrize("chunks", [2, 4])
def test_chunked_matches_unchunked(chunks):
  # spheres.xml exercises contacts + solver, the path chunking targets
  mjm = load_mj("spheres.xml")
  m = mjtpu.put_model(mjm)

  ref = _make_batch(m, mjm, 8)
  step = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))
  for _ in range(10):
    ref = step(m, ref)

  stepper = parallel.chunked_step(m, chunks=chunks)
  parts = stepper.split(_make_batch(m, mjm, 8))
  assert len(parts) == chunks
  for _ in range(10):
    parts = stepper.step_parts(parts)
  out = stepper.join(parts)

  np.testing.assert_allclose(np.asarray(out.qpos), np.asarray(ref.qpos),
                             atol=1e-12)
  np.testing.assert_allclose(np.asarray(out.qvel), np.asarray(ref.qvel),
                             atol=1e-12)


def test_chunked_oneshot_callable():
  mjm = load_mj("cartpole.xml")
  m = mjtpu.put_model(mjm)
  ref = _make_batch(m, mjm, 8)
  ref = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))(m, ref)
  out = parallel.chunked_step(m, chunks=2)(_make_batch(m, mjm, 8))
  np.testing.assert_allclose(np.asarray(out.qpos), np.asarray(ref.qpos),
                             atol=1e-12)


def test_chunked_auto_picks_divisor():
  mjm = load_mj("cartpole.xml")
  m = mjtpu.put_model(mjm)
  batch = _make_batch(m, mjm, 12)
  # a tiny flop-rate prior inflates the time estimate -> K must rise, and
  # must still divide B=12
  stepper = parallel.chunked_step(m, chunks="auto", flop_rate=1e3,
                                  target_ms=1.0)
  k = stepper.resolve_chunks(batch)
  assert k > 1 and 12 % k == 0
  # a huge prior -> single dispatch
  stepper = parallel.chunked_step(m, chunks="auto", flop_rate=1e30,
                                  target_ms=1.0)
  assert stepper.resolve_chunks(batch) == 1


def test_chunked_rejects_nondivisor():
  mjm = load_mj("cartpole.xml")
  m = mjtpu.put_model(mjm)
  batch = _make_batch(m, mjm, 8)
  with pytest.raises(ValueError, match="does not divide"):
    parallel.chunked_step(m, chunks=3).split(batch)
