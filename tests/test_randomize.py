"""Domain randomization: batched-Model vmap (capability-plus; the reference
batches Data only). Parity oracle: the batched step with per-env physics
must bit-match stepping each env under its own unbatched Model."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu
from mjtpu import parallel
from tests.conftest import load_mj

_BALL_XML = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <geom type="plane" size="5 5 .1"/>
    <body pos="0 0 0.28">
      <freejoint/>
      <geom type="sphere" size="0.3" mass="1" friction="1 .005 .0001"/>
    </body>
  </worldbody>
</mujoco>
"""


def _rollout(step_fn, d, nsteps):
  for _ in range(nsteps):
    d = step_fn(d)
  return d


def _parity(mjm, updates, nsteps=15, qvel0=None):
  """Batched randomized step vs per-env unbatched steps."""
  m = mjtpu.put_model(mjm)
  d0 = mjtpu.make_data(m)
  if qvel0 is not None:
    d0 = d0.replace(qvel=jnp.asarray(qvel0))
  B = next(iter(updates.values())).shape[0]
  batch = jax.vmap(lambda _: d0)(jnp.arange(B))

  step_b, mb = parallel.randomized_step(m, updates)
  out = _rollout(step_b, batch, nsteps)

  step1 = jax.jit(mjtpu.step)
  for i in range(B):
    mi = m.tree_replace({k: jnp.asarray(v[i]) for k, v in updates.items()})
    di = _rollout(lambda d: step1(mi, d), d0, nsteps)
    np.testing.assert_allclose(
        np.asarray(out.qpos[i]), np.asarray(di.qpos), atol=1e-12,
        err_msg=f"env {i} diverged from its per-model rollout",
    )
    np.testing.assert_allclose(
        np.asarray(out.qvel[i]), np.asarray(di.qvel), atol=1e-12,
        err_msg=f"env {i} qvel",
    )
  return out, mb


def test_friction_randomization_contact_parity():
  mjm = mujoco.MjModel.from_xml_string(_BALL_XML)
  B = 4
  fric = np.tile(np.array(mjm.geom_friction), (B, 1, 1))
  # low values so the friction cone saturates while the ball slips, and on
  # BOTH geoms — contact friction mixes as the max of the pair, so varying
  # the ball alone is masked by the plane's default mu=1
  fric[:, :, 0] = np.array([[0.01, 0.05, 0.2, 0.8]]).T
  qvel0 = np.zeros(mjm.nv)
  qvel0[0] = 4.0  # slide so friction actually differentiates trajectories
  out, _ = _parity(mjm, {"geom_friction": jnp.asarray(fric)}, qvel0=qvel0)
  # the randomization must actually matter: different friction, different vx
  vx = np.asarray(out.qvel[:, 0])
  assert np.ptp(vx) > 1e-3, f"friction sweep had no effect: {vx}"


def test_mass_gain_damping_timestep_parity():
  mjm = load_mj("cartpole.xml")
  B = 3
  rng = np.random.default_rng(3)
  mass = np.tile(np.array(mjm.body_mass), (B, 1))
  mass[:, 1] *= rng.uniform(0.5, 1.5, B)  # cart mass
  gain = np.tile(np.array(mjm.actuator_gainprm), (B, 1, 1))
  gain[:, 0, 0] *= rng.uniform(0.8, 1.2, B)
  damp = np.tile(np.array(mjm.dof_damping), (B, 1))
  damp *= rng.uniform(0.5, 2.0, (B, 1))
  ts = np.full((B,), 0.005) * rng.uniform(0.9, 1.1, B)
  updates = {
      "body_mass": jnp.asarray(mass),
      "actuator_gainprm": jnp.asarray(gain),
      "dof_damping": jnp.asarray(damp),
      "opt.timestep": jnp.asarray(ts),
  }
  m = mjtpu.put_model(mjm)
  d0 = mjtpu.make_data(m).replace(
      qpos=jnp.asarray([0.1, 0.2]), ctrl=jnp.asarray([0.7])
  )
  batch = jax.vmap(lambda _: d0)(jnp.arange(B))
  step_b, _ = parallel.randomized_step(m, updates)
  out = _rollout(step_b, batch, 15)

  step1 = jax.jit(mjtpu.step)
  for i in range(B):
    mi = m.tree_replace({k: jnp.asarray(v[i]) for k, v in updates.items()})
    di = d0
    for _ in range(15):
      di = step1(mi, di)
    np.testing.assert_allclose(
        np.asarray(out.qpos[i]), np.asarray(di.qpos), atol=1e-12
    )
  assert np.ptp(np.asarray(out.qpos[:, 1])) > 1e-6


def test_model_axes_inference():
  mjm = load_mj("cartpole.xml")
  m = mjtpu.put_model(mjm)
  mb, axes = parallel.randomize(
      m, {"body_mass": jnp.tile(jnp.asarray(m.body_mass), (4, 1))}
  )
  assert axes.body_mass == 0
  assert axes.geom_friction is None
  assert axes.opt.timestep is None
  # shape-inferred axes agree with the ones randomize() built
  inferred = parallel.model_axes(m, mb)
  assert jax.tree.structure(inferred) == jax.tree.structure(axes)
  assert inferred.body_mass == 0 and inferred.dof_damping is None


def test_static_field_rejected():
  m = mjtpu.put_model(load_mj("cartpole.xml"))
  with pytest.raises(ValueError, match="static"):
    parallel.randomize(m, {"geom_type": np.zeros((2, m.ngeom), np.int32)})
  with pytest.raises(ValueError, match="no traced field"):
    parallel.randomize(m, {"not_a_field": np.zeros((2, 3))})


def test_shape_and_batch_mismatch_rejected():
  m = mjtpu.put_model(load_mj("cartpole.xml"))
  with pytest.raises(ValueError, match="expected shape"):
    parallel.randomize(m, {"body_mass": np.zeros(m.nbody)})  # missing B dim
  with pytest.raises(ValueError, match="inconsistent batch"):
    parallel.randomize(m, {
        "body_mass": np.zeros((2, m.nbody)),
        "dof_damping": np.ones((3, m.nv)),
    })


def test_structural_gate_rejected():
  # model with zero damping: the damping path was never traced
  mjm = mujoco.MjModel.from_xml_string(_BALL_XML)
  m = mjtpu.put_model(mjm)
  assert not m.has_dof_damping
  with pytest.raises(ValueError, match="has_dof_damping"):
    parallel.randomize(m, {"dof_damping": np.ones((2, m.nv))})


def test_frictionloss_pattern_guard():
  # the free ball has no frictionloss dofs baked
  m = mjtpu.put_model(mujoco.MjModel.from_xml_string(_BALL_XML))
  v = np.zeros((2, m.nv))
  v[:, 0] = 0.5  # enabling frictionloss on a dof with no baked row
  with pytest.raises(ValueError, match="nonzero-dof set"):
    parallel.randomize(m, {"dof_frictionloss": v})


def test_limit_two_sidedness_guard():
  mjm = load_mj("cartpole.xml")  # slider range (-2, 2), margin 0
  m = mjtpu.put_model(mjm)
  # a huge margin makes every limited joint two-sided (width < 2*margin),
  # flipping the baked one-sided limit-row layout
  mrg = np.tile(np.array(mjm.jnt_margin), (2, 1))
  mrg[1] = 10.0
  with pytest.raises(ValueError, match="two-sided"):
    parallel.randomize(m, {"jnt_margin": mrg})


def test_geom_size_round_only():
  mjm = mujoco.MjModel.from_xml_string(_BALL_XML)
  m = mjtpu.put_model(mjm)
  B = 3
  size = np.tile(np.array(mjm.geom_size), (B, 1, 1))
  size[:, 1, 0] = [0.25, 0.3, 0.35]  # sphere radius: fine
  mb, axes = parallel.randomize(m, {"geom_size": jnp.asarray(size)})
  assert axes.geom_size == 0
  # varying the plane's size is rejected (not a round primitive)
  size2 = np.tile(np.array(mjm.geom_size), (B, 1, 1))
  size2[:, 0, 0] = [4.0, 5.0, 6.0]
  with pytest.raises(ValueError, match="round primitive"):
    parallel.randomize(m, {"geom_size": size2})


def test_sphere_radius_randomization_parity():
  mjm = mujoco.MjModel.from_xml_string(_BALL_XML)
  B = 3
  size = np.tile(np.array(mjm.geom_size), (B, 1, 1))
  size[:, 1, 0] = [0.25, 0.3, 0.35]
  out, _ = _parity(mjm, {"geom_size": jnp.asarray(size)}, nsteps=40)
  # resting heights must track the randomized radii
  z = np.asarray(out.qpos[:, 2])
  assert z[0] < z[1] < z[2]


def test_randomize_with_consts_matches_fresh_put_model():
  """Mass randomization with recomputed derived constants must bit-match a
  from-scratch put_model of the modified MjModel (the strongest oracle:
  every mj_setConst output the dynamics consume is covered)."""
  import copy

  mjm = load_mj("cartpole.xml")
  m = mjtpu.put_model(mjm)
  B = 3
  mass = np.tile(np.array(mjm.body_mass), (B, 1))
  mass[:, 1] *= [0.5, 1.0, 2.0]
  mb, axes = parallel.randomize_with_consts(mjm, m, {"body_mass": mass})
  # derived constants were batched and actually vary
  assert axes.dof_M0 == 0 and axes.body_invweight0 == 0
  assert axes.stat.meaninertia == 0
  assert np.ptp(np.asarray(mb.dof_M0), axis=0).max() > 0

  d0 = mjtpu.make_data(m).replace(
      qpos=jnp.asarray([0.1, 0.2]), ctrl=jnp.asarray([0.6])
  )
  batch = jax.vmap(lambda _: d0)(jnp.arange(B))
  step_b = jax.jit(jax.vmap(mjtpu.step, in_axes=(axes, 0)))
  for _ in range(10):
    batch = step_b(mb, batch)

  step1 = jax.jit(mjtpu.step)
  for i in range(B):
    mjm_i = copy.copy(mjm)
    mjm_i.body_mass[:] = mass[i]
    mujoco.mj_setConst(mjm_i, mujoco.MjData(mjm_i))
    mi = mjtpu.put_model(mjm_i)
    di = d0
    for _ in range(10):
      di = step1(mi, di)
    np.testing.assert_allclose(
        np.asarray(batch.qpos[i]), np.asarray(di.qpos), atol=1e-12,
        err_msg=f"env {i}: batched consts diverge from fresh put_model",
    )
    np.testing.assert_allclose(
        np.asarray(batch.qvel[i]), np.asarray(di.qvel), atol=1e-12
    )


def test_sharded_randomized_step():
  if len(jax.devices()) < 8:
    pytest.skip("needs 8 (virtual) devices")
  mesh = parallel.make_mesh(jax.devices()[:8])
  mjm = load_mj("cartpole.xml")
  m = mjtpu.put_model(mjm)
  B = 16
  mass = np.tile(np.array(mjm.body_mass), (B, 1))
  mass[:, 1] *= np.linspace(0.5, 1.5, B)
  updates = {"body_mass": jnp.asarray(mass)}

  d0 = mjtpu.make_data(m).replace(qpos=jnp.asarray([0.1, 0.2]))
  batch = jax.vmap(lambda _: d0)(jnp.arange(B))
  batch = parallel.shard_batch(batch, mesh)
  step_fn, mb = parallel.sharded_randomized_step(m, updates, mesh)
  out = step_fn(batch)

  ref_step, _ = parallel.randomized_step(m, updates)
  ref = ref_step(jax.vmap(lambda _: d0)(jnp.arange(B)))
  np.testing.assert_allclose(
      np.asarray(out.qpos), np.asarray(ref.qpos), atol=1e-12
  )
