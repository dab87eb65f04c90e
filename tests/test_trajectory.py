"""Trajectory parity vs MuJoCo C (the reference's mjx_correctness oracle:
100-step trajectories at float64, reference test/mjx_correctness_test.py:200-383)."""

import pathlib

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu
from tests.conftest import load_mj

SMOOTH_MODELS = [
    "pendulum.xml",
    "cartpole.xml",
    "ball_free.xml",
    "pendulum_rk4.xml",
    "pendulum_implicit.xml",
    "implicit_full.xml",
    "implicit_fluid.xml",
    "friction_tendon.xml",
    "equality.xml",
    "weld.xml",
]

# contact parity: exact pair functions + Newton converge to C at f64
CONTACT_MODELS = [
    "spheres.xml",
    "capsules.xml",
    "elliptic.xml",
    "condim4_pyramidal.xml",
    "condim4_elliptic.xml",
    "condim6_elliptic.xml",
    # rolling cylinder + tumbling ellipsoid on a plane: the
    # plane_cylinder/plane_ellipsoid colliders (capability-plus — the
    # reference ships them as unregistered dead code)
    "roll.xml",
    # sphere dropped onto a lying cylinder: the sphere_cylinder collider
    "sph_cyl.xml",
]


def run_traj(name, nsteps=100, tol=2e-8, ctrl=False, seed=0, kick=0.1):
  mjm = load_mj(name)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-kick, kick, mjm.nq)
  mjd.qvel[:] = rng.uniform(-kick, kick, mjm.nv)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  step = jax.jit(mjtpu.step)
  worst = 0.0
  for i in range(nsteps):
    if ctrl and mjm.nu:
      c = rng.uniform(-1, 1, mjm.nu)
      mjd.ctrl[:] = c
      d = d.replace(ctrl=jnp.asarray(np.array(c)))
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    err = max(
        np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
        np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
    )
    worst = max(worst, err)
    assert err < tol, f"{name} diverged at step {i}: {err:.3e}"
  return worst


@pytest.mark.parametrize("name", SMOOTH_MODELS)
def test_trajectory(name):
  run_traj(name)


@pytest.mark.parametrize(
    "name", ["cartpole.xml", "friction_tendon.xml", "muscle.xml",
             "implicit_full.xml"]
)
def test_trajectory_ctrl(name):
  # muscle.xml exercises every actuator dyntype at once: muscle (FLV curves),
  # filter, filterexact (exact exponential), integrator w/ actrange clamp
  run_traj(name, ctrl=True)


@pytest.mark.parametrize("name", CONTACT_MODELS)
def test_trajectory_contacts(name):
  run_traj(name, tol=1e-8)


def test_trajectory_cg():
  """CG converges to solver tolerance, not machine eps: looser bound
  (reference solver_test tolerances, test/solver_test.py)."""
  run_traj("condim_cg.xml", tol=1e-4)


def test_boxes_stable():
  """Box stacking: SAT manifold differs from C's box-box in contact
  selection (same as MJX), so assert physical sanity: settles, no blowup."""
  mjm = load_mj("boxes.xml")
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  step = jax.jit(mjtpu.step)
  # 1000 steps: settling transients can legitimately last past 500 (a box
  # caught mid-tumble at 500 is chaos, not instability)
  for _ in range(1000):
    d = step(m, d)
  qpos = np.asarray(d.qpos)
  assert np.isfinite(qpos).all()
  # boxes rest on/near the floor, not sunken or flying
  assert 0.05 < qpos[2] < 0.3
  qvel = np.asarray(d.qvel)
  assert np.abs(qvel).max() < 0.5


def test_vmap_batch_matches_single():
  """vmap(step) env 0 == single-env step (reference vmap parity tests)."""
  mjm = load_mj("cartpole.xml")
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  rng = np.random.default_rng(3)
  qpos = jnp.asarray(rng.uniform(-0.1, 0.1, (8, mjm.nq)))
  qvel = jnp.asarray(rng.uniform(-0.1, 0.1, (8, mjm.nv)))
  batch = jax.vmap(lambda q, v: mjtpu.make_data(m).replace(qpos=q, qvel=v))(
      qpos, qvel
  )
  stepped = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))(m, batch)
  single = jax.jit(mjtpu.step)(m, jax.tree.map(lambda x: x[0], batch))
  np.testing.assert_allclose(
      np.asarray(stepped.qpos[0]), np.asarray(single.qpos), atol=1e-12
  )


def test_nan_recovery():
  """_check_state resets non-finite states (reference forward.py:44-59)."""
  mjm = load_mj("pendulum.xml")
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(qpos=jnp.full_like(d.qpos, jnp.nan))
  d = jax.jit(mjtpu.step)(m, d)
  assert np.isfinite(np.asarray(d.qpos)).all()


def test_no_retrace():
  """jit(step) must not retrace across calls with fresh Data (the JAX analog
  of the reference's recompile guard, compile_recompile_integration_test)."""
  mjm = load_mj("cartpole.xml")
  m = mjtpu.put_model(mjm)
  # count traces directly via a trace-time side effect: a retrace re-runs
  # the python function.  (_cache_size() is unreliable once executable
  # caches — in-memory global or persistent — serve the compile.)
  traces = 0

  def stepper(m_, d_):
    nonlocal traces
    traces += 1
    return mjtpu.step(m_, d_)

  step = jax.jit(stepper)
  for i in range(3):
    d = mjtpu.make_data(m)
    d = d.replace(qpos=d.qpos + 0.01 * i)
    d = step(m, d)
  assert traces == 1, f"step retraced: {traces} traces for 3 calls"


def test_rk4_traces_forward_once(monkeypatch):
  """RK4's extra stages run under lax.scan, so one jit(step) trace runs
  the forward pipeline exactly twice (the step's own forward + ONE scan
  body), not 4x.  Guards the compile-time cliff the unrolled form had
  (115 s XLA compile on walker2d at B=131072, PERFORMANCE.md)."""
  from mjtpu._src import forward as fwd_mod

  mjm = load_mj("pendulum_rk4.xml")
  m = mjtpu.put_model(mjm)
  calls = 0
  real_forward = fwd_mod.forward

  def counting_forward(*args, **kwargs):
    nonlocal calls
    calls += 1
    return real_forward(*args, **kwargs)

  monkeypatch.setattr(fwd_mod, "forward", counting_forward)
  jax.jit(mjtpu.step).lower(m, mjtpu.make_data(m))
  assert calls <= 2, f"forward traced {calls}x in one RK4 step trace"


ZOO_ASSETS = pathlib.Path(__file__).parent.parent / "mjtpu" / "zoo" / "assets"


@pytest.mark.parametrize("name", ["halfcheetah.xml", "ant.xml", "humanoid.xml"])
def test_trajectory_robots(name):
  """Flagship benchmark models track MuJoCo C with random ctrl (the
  reference's mjx_correctness ant/halfcheetah/humanoid oracles)."""
  mjm = mujoco.MjModel.from_xml_path(str(ZOO_ASSETS / name))
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(0)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.05, 0.05, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.05, 0.05, mjm.nv)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  step = jax.jit(mjtpu.step)
  for i in range(100):
    c = rng.uniform(-1, 1, mjm.nu)
    mjd.ctrl[:] = c
    d = d.replace(ctrl=jnp.asarray(np.array(c)))
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    err = max(
        np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
        np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
    )
    assert err < 1e-6, f"{name} diverged at step {i}: {err:.3e}"


def test_trajectory_humanoid_terrain():
  """BASELINE config 4: humanoid + ImplicitFast + mesh + hfield collisions.

  Exact trajectory parity through an hfield impact event is not attainable
  (C's hfield collider is libccd MPR over prisms; ours is a triangle
  manifold — contact-onset dist differs below margin resolution, and the
  reference's own mjx_correctness suite includes no hfield trajectories).
  Asserted envelope: strict 1e-6 parity while airborne, contact onset
  within 3 steps of C, then a physical-sanity rollout (finite, settles
  on the terrain)."""
  mjm = mujoco.MjModel.from_xml_path(str(ZOO_ASSETS / "humanoid_terrain.xml"))
  from bench import fill_hfields

  fill_hfields(mjm)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(0)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.05, 0.05, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.05, 0.05, mjm.nv)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  step = jax.jit(mjtpu.step)
  onset_c = onset_ours = None
  for i in range(100):
    c = rng.uniform(-1, 1, mjm.nu)
    mjd.ctrl[:] = c
    d = d.replace(ctrl=jnp.asarray(np.array(c)))
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    if onset_c is None and mjd.ncon > 0:
      onset_c = i
    if onset_ours is None and bool((np.asarray(d.contact.dist) < 0).any()):
      onset_ours = i
    if onset_c is None and onset_ours is None:
      err = max(
          np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
          np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
      )
      assert err < 1e-6, f"airborne phase diverged at step {i}: {err:.3e}"
  assert onset_c is not None and onset_ours is not None, (
      f"no terrain impact within 100 steps (C: {onset_c}, ours: {onset_ours})"
  )
  assert abs(onset_c - onset_ours) <= 3, (
      f"contact onset disagrees: C step {onset_c}, ours step {onset_ours}"
  )
  for _ in range(200):
    d = step(m, d)
  qpos = np.asarray(d.qpos)
  qvel = np.asarray(d.qvel)
  assert np.isfinite(qpos).all() and np.isfinite(qvel).all()
  assert -0.5 < qpos[2] < 2.0, f"root z {qpos[2]} left the terrain envelope"
  assert np.abs(qvel).max() < 20.0


def test_max_contact_points():
  """<numeric name="max_contact_points"> caps contact slots via top-k by
  penetration (reference collision_driver.py:571-578, 822-840)."""
  xml = """<mujoco>
    <custom><numeric name="max_contact_points" data="6"/></custom>
    <worldbody>
      <geom type="plane" size="5 5 0.1"/>
      <body pos="0 0 0.3"><freejoint/><geom type="sphere" size="0.1" mass="0.5"/></body>
      <body pos="0.5 0 0.3"><freejoint/><geom type="sphere" size="0.1" mass="0.5"/></body>
      <body pos="0 0.5 0.3"><freejoint/><geom type="sphere" size="0.1" mass="0.5"/></body>
      <body pos="0.25 0.25 0.6"><freejoint/><geom type="sphere" size="0.1" mass="0.5"/></body>
      <body pos="0.25 -0.25 0.6"><freejoint/><geom type="sphere" size="0.1" mass="0.5"/></body>
    </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  assert mjtpu.ncon(m) == 6  # raw candidate count is 15 (5 floor + 10 pairs)
  d = mjtpu.make_data(m)
  assert d.contact.dist.shape == (6,)
  step = jax.jit(mjtpu.step)
  for _ in range(200):
    d = step(m, d)
  qpos = np.asarray(d.qpos)
  assert np.isfinite(qpos).all()
  # spheres rest on the floor (the 4 deepest contacts carry the load)
  z = qpos[2::7]
  assert (z > 0.05).all() and (z < 0.45).all()


def test_trajectory_big_nv_chain():
  """40-dof serial chain parity (large-tree coverage; reference handles big
  nv via its sparse LDL path — mjtpu stays dense + Pallas fused kernel,
  see mjtpu/ops/fused.py)."""
  worst = run_traj("chain40.xml", nsteps=60, tol=5e-7, kick=0.03)
  assert worst < 5e-7


def test_implicitfast_fluid_close():
  """ImplicitFast + box fluid: mjtpu uses the exact fluid Jacobian in
  qDeriv; C's implicitfast uses an approximate linearization (empirically:
  within-body off-diagonals differ).  Same physics, slightly different
  implicit matrix, so trajectories track loosely rather than bitwise.
  (Full Implicit + fluid IS bit-parity: implicit_fluid.xml above.)"""
  import mujoco as mj
  xml = (pathlib.Path(__file__).parent / "models" / "implicit_fluid.xml"
         ).read_text().replace('integrator="implicit"',
                               'integrator="implicitfast"')
  mjm = mj.MjModel.from_xml_string(xml)
  mjd = mj.MjData(mjm)
  rng = np.random.default_rng(0)
  mjd.qvel[:] = rng.uniform(-3, 3, mjm.nv)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m).replace(qpos=jnp.asarray(np.array(mjd.qpos)),
                                 qvel=jnp.asarray(np.array(mjd.qvel)))
  step = jax.jit(mjtpu.step)
  for _ in range(150):
    mj.mj_step(mjm, mjd)
    d = step(m, d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=5e-3)


HB = "/root/repo/mjtpu/zoo/assets/humanoid_bench.xml"


def test_humanoid_bench_converged_trajectory():
  """The benchmark humanoid (standard 27-dof morphology, pair-only
  contacts) matches C over 100 steps once the solver runs to convergence
  (the shipped benchmark config iterations=1/ls_iterations=4 is a
  truncated-solver regime where iterate paths are ULP-tie-sensitive in
  every engine — MJX included; see test below)."""
  mjm = mujoco.MjModel.from_xml_path(HB)
  mjm.opt.iterations = 50
  mjm.opt.ls_iterations = 50
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(5)
  mjd.qvel[:] = rng.uniform(-0.1, 0.1, mjm.nv)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  step = jax.jit(mjtpu.step)
  for i in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    err = max(
        np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
        np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
    )
    assert err < 1e-7, f"step {i}: err {err:.3e}"


def test_humanoid_bench_truncated_iterate_parity():
  """At the shipped benchmark config (iterations=1, ls_iterations=4) the
  solver iterate map — warmstart selection, Newton direction, and the
  3-point lo/hi bracket linesearch — matches C step-for-step until a
  knife-edge tie (a candidate whose phi' is algebraically zero) flips on
  rounding.  Assert exact parity over the first steps, before any tie."""
  mjm = mujoco.MjModel.from_xml_path(HB)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(11)
  mjd.qvel[:] = rng.uniform(-0.1, 0.1, mjm.nv)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  step = jax.jit(mjtpu.step)
  for i in range(2):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    err = max(
        np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
        np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
    )
    assert err < 1e-10, f"step {i}: err {err:.3e}"


@pytest.mark.parametrize("name", ["ant_bench.xml", "hopper_bench.xml"])
def test_trajectory_bench_models(name):
  """The benchmark-equivalent ant (fixed base, self-collision, 20-sensor
  suite) and hopper (Euler 5ms, unlimited joints) track C with random ctrl
  — same structural sizes as the reference's benchmark models."""
  mjm = mujoco.MjModel.from_xml_path(str(ZOO_ASSETS / name))
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(2)
  mjd.qvel[:] = rng.uniform(-0.1, 0.1, mjm.nv)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(qvel=jnp.asarray(np.array(mjd.qvel)))
  step = jax.jit(mjtpu.step)
  for i in range(100):
    c = rng.uniform(-1, 1, mjm.nu)
    mjd.ctrl[:] = c
    d = d.replace(ctrl=jnp.asarray(np.array(c)))
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    err = max(
        np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
        np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
    )
    assert err < 1e-7, f"{name} diverged at step {i}: {err:.3e}"
