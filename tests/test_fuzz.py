"""Fuzzed-MJCF trajectory parity vs MuJoCo C (reference test strategy:
test_util.create_mjcf seeds feeding per-stage/trajectory oracles,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu
from mjtpu._src.test_util import create_mjcf


def _traj_parity(xml, seed, nsteps=50):
  """50-step trajectory parity of a fuzz model vs mj_step, random ctrl."""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.05, 0.05, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.1, 0.1, mjm.nv)
  try:
    m = mjtpu.put_model(mjm)
  except NotImplementedError as e:
    pytest.skip(f"unsupported fuzz feature: {e}")
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  step = jax.jit(mjtpu.step)
  for i in range(nsteps):
    if mjm.nu:
      c = rng.uniform(-1, 1, mjm.nu)
      mjd.ctrl[:] = c
      d = d.replace(ctrl=jnp.asarray(np.array(c)))
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    err = max(
        np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
        np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
    )
    assert err < 1e-6, f"fuzz seed {seed} diverged at step {i}: {err:.3e}"


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_trajectory(seed):
  # sphere/capsule primitives have bit-exact narrowphase vs C
  xml = create_mjcf(
      seed,
      frictionloss=(seed % 2 == 0),
      tendons=(seed % 3 == 0),
      geom_types=("sphere", "capsule"),
  )
  _traj_parity(xml, seed)


@pytest.mark.parametrize("seed", [0, 2, 6, 10])
def test_fuzz_boxes_trajectory(seed):
  """Box-heavy fuzz scenes ALSO bit-track C: plane-box, sphere-box and
  shallow box-box SAT all match mj's colliders (probed: 11 of 12 seeds
  in [100, 112) track to <4e-11 over 50 steps).  The exception is deep
  initial corner penetration (seed 111 below): our SAT manifold picks
  different contact positions than mj's analytic box colliders there
  (same deviation as MJX), so that seed gets a stability check only."""
  _traj_parity(create_mjcf(seed + 100, geom_types=("box", "sphere")), seed)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_pairs_excludes_equality(seed):
  """Fuzz models with explicit <pair>/<exclude>/<equality> sections
  (reference create_mjcf's pair/exclude fuzzing) track C trajectories."""
  xml = create_mjcf(
      seed + 200,
      geom_types=("sphere", "capsule"),
      contact_pairs=True,
      excludes=(seed % 2 == 0),
      equality=(seed % 2 == 1),
  )
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.03, 0.03, mjm.nq)
  try:
    m = mjtpu.put_model(mjm)
  except NotImplementedError as e:
    pytest.skip(f"unsupported fuzz feature: {e}")
  d = mjtpu.make_data(m)
  d = d.replace(qpos=jnp.asarray(np.array(mjd.qpos)))
  step = jax.jit(mjtpu.step)
  for i in range(50):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    err = max(
        np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
        np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
    )
    assert err < 1e-6, f"pair-fuzz seed {seed} diverged at step {i}: {err:.3e}"


@pytest.mark.parametrize("seed", [11])
def test_fuzz_boxes_stable(seed):
  """Deep-corner-penetration box fuzz (see test_fuzz_boxes_trajectory):
  narrowphase legitimately differs from mj's analytic box colliders here,
  and the scene is a degenerate blow-up in BOTH engines (C also reaches
  |qvel| ~ 3e3 by step 100), so assert NaN containment only."""
  xml = create_mjcf(seed + 100, geom_types=("box", "sphere"))
  mjm = mujoco.MjModel.from_xml_string(xml)
  try:
    m = mjtpu.put_model(mjm)
  except NotImplementedError as e:
    pytest.skip(f"unsupported fuzz feature: {e}")
  d = mjtpu.make_data(m)
  step = jax.jit(mjtpu.step)
  for _ in range(100):
    d = step(m, d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  assert np.isfinite(np.asarray(d.qvel)).all()


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_spatial_tendon(seed):
  """Structural fuzz over SPATIAL tendons (sites + wrap sphere threaded by
  create_mjcf): trajectories track C through the mju_wrap path on random
  trees, not just the hand-written wrap models of test_tendon.py."""
  xml = create_mjcf(
      seed + 300,
      geom_types=("sphere", "capsule"),
      spatial_tendons=True,
      tendons=(seed % 2 == 0),
  )
  _traj_parity(xml, seed)


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_equality_classes(seed):
  """Fuzz over all four equality classes (connect/weld/joint/tendon —
  reference supports the first three, constraint.py:168-371 adds tendon
  eq): random trees with a randomly drawn constraint class track C."""
  xml = create_mjcf(
      seed + 400,
      geom_types=("sphere", "capsule"),
      tendons=True,
      equality=True,
      equality_types=("connect", "weld", "joint", "tendon"),
  )
  _traj_parity(xml, seed)


@pytest.mark.parametrize("seed", [703, 704, 706, 709, 714])
def test_fuzz_tendon_equality(seed):
  """Tendon-equality fuzz (capability-plus: the reference lacks tendon eq).
  Seeds picked so the generated model actually carries two fixed tendons
  and an eq_type=TENDON row (probed against C 2026-08-20)."""
  xml = create_mjcf(
      seed,
      geom_types=("sphere", "capsule"),
      tendons=True,
      equality=True,
      equality_types=("tendon",),
  )
  mjm = mujoco.MjModel.from_xml_string(xml)
  assert (mjm.eq_type == 3).any()  # mjEQ_TENDON: the class under test
  _traj_parity(xml, seed)


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_elliptic_cone(seed):
  """Elliptic-cone trajectory fuzz (the r3 solver rework's cone groups +
  Hessian path): contact-rich random scenes under cone=elliptic track C."""
  xml = create_mjcf(
      seed + 500,
      geom_types=("sphere", "capsule"),
      cone="elliptic",
      contact_pairs=True,
      frictionloss=(seed % 2 == 0),
  )
  _traj_parity(xml, seed)


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_implicit_integrator(seed):
  """Implicit/ImplicitFast integrator fuzz (the full-Implicit fluid/
  tendon-damping derivative path + discrete inverse): random trees with
  damping + tendons under both implicit integrators track C."""
  xml = create_mjcf(
      seed + 600,
      geom_types=("sphere", "capsule"),
      integrator="implicit" if seed % 2 else "implicitfast",
      tendons=True,
      frictionloss=(seed % 3 == 0),
  )
  _traj_parity(xml, seed)


def test_f32_jit_parallel_capsules_finite():
  """Regression: XLA reassociates additive epsilon guards at f32.

  (1 - dab^2) + 1e-12 gets rewritten to (1 + 1e-12) - dab^2 == 1 - dab^2,
  erasing the guard, so exactly-parallel capsule pairs (humanoid thighs at
  qpos0) produced 0/0 -> NaN contact dist under jit at f32 — eager mode was
  fine, f64 was fine, which is why trajectory parity never caught it.  The
  guards are now jnp.maximum (math.py closest_segment_*)."""
  import pathlib
  mjm = mujoco.MjModel.from_xml_path(
      str(pathlib.Path(mjtpu.__file__).parent / "zoo" / "assets" / "humanoid.xml"))
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d = mjtpu.make_data(m)
  d = jax.jit(mjtpu.step)(m, d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  assert np.isfinite(np.asarray(d.contact.dist)).all()


@pytest.mark.integration
@pytest.mark.parametrize("seed", range(6, 30))
def test_fuzz_trajectory_wide(seed):
  """Wide-seed sweep (release gate: RELEASE.md pre-release gates run with
  -m integration); same oracle as test_fuzz_trajectory."""
  test_fuzz_trajectory(seed)


@pytest.mark.integration
@pytest.mark.parametrize("seed", [1, 3, 4, 5, 7, 8, 9])
def test_fuzz_boxes_trajectory_wide(seed):
  """Box-fuzz wide sweep (release gate), same oracle as
  test_fuzz_boxes_trajectory."""
  _traj_parity(create_mjcf(seed + 100, geom_types=("box", "sphere")), seed)
