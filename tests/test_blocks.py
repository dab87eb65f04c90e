"""Forest-blocked mass-matrix factorization (smooth.mass_blocks): block
partition correctness, factor/solve parity vs MuJoCo C, and trajectory
parity on multi-tree scenes (the TPU-native equivalent of the reference's
sparse LDL schedules — SURVEY.md §7 step 9)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mjtpu
from mjtpu._src import smooth
from tests.conftest import load_mj

FOREST_XML = """<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="10 10 0.1"/>
    <body pos="0 0 0.3"><freejoint/><geom type="sphere" size="0.1" mass="0.5"/></body>
    <body pos="1 0 0.3"><freejoint/><geom type="box" size="0.1 0.1 0.1" mass="0.7"/></body>
    <body pos="2 0 1.0">
      <joint type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04" mass="0.3"/>
      <body pos="0.4 0 0">
        <joint type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04" mass="0.3"/>
      </body>
    </body>
    <body pos="3 0 0.3"><freejoint/><geom type="sphere" size="0.08" mass="0.2"/></body>
  </worldbody>
</mujoco>"""

TENDON_COUPLED_XML = """<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="slide" axis="0 0 1" damping="0.2"/>
      <geom type="sphere" size="0.1" mass="0.5"/>
    </body>
    <body pos="1 0 1">
      <joint name="j2" type="slide" axis="0 0 1" damping="0.2"/>
      <geom type="sphere" size="0.1" mass="0.5"/>
    </body>
    <body pos="2 0 1">
      <joint name="j3" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04" mass="0.3"/>
    </body>
  </worldbody>
  <tendon>
    <fixed name="t" armature="0.02" damping="0.3">
      <joint joint="j1" coef="1"/>
      <joint joint="j2" coef="-1"/>
    </fixed>
  </tendon>
</mujoco>"""


def test_mass_blocks_partition():
  # single tree -> None (dense path)
  m = mjtpu.put_model(load_mj("pendulum.xml"))
  assert smooth.mass_blocks(m) is None
  # two free bodies -> two 6-dof blocks
  m = mjtpu.put_model(load_mj("spheres.xml"))
  assert smooth.mass_blocks(m) == ((0, 6), (6, 6))
  # forest: 6 + 6 + 2 + 6
  m = mjtpu.put_model(mujoco.MjModel.from_xml_string(FOREST_XML))
  assert smooth.mass_blocks(m) == ((0, 6), (6, 6), (12, 2), (14, 6))
  # a fixed tendon across trees does NOT merge blocks: MuJoCo's qM sparsity
  # drops cross-tree armature/damping terms (oracle-verified), so each
  # 1-dof tree stays its own block
  m = mjtpu.put_model(mujoco.MjModel.from_xml_string(TENDON_COUPLED_XML))
  assert smooth.mass_blocks(m) == ((0, 1), (1, 1), (2, 1))


def _forward_state(mjm, seed=0):
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.2, 0.2, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.2, 0.2, mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  d = mjtpu.crb(m, mjtpu.tendon(m, mjtpu.com_pos(m, mjtpu.kinematics(m, d))))
  if mjm.ntendon:
    d = mjtpu.tendon_armature(m, d)
  return mjm, mjd, m, d


def test_blocked_factor_solve_vs_c():
  """Blocked factor_m/solve_m matches mj_solveM on a multi-tree scene."""
  for xml in (FOREST_XML, TENDON_COUPLED_XML):
    mjm, mjd, m, d = _forward_state(mujoco.MjModel.from_xml_string(xml))
    assert smooth.mass_blocks(m) is not None
    d = mjtpu.factor_m(m, d)
    x = np.linspace(-1.0, 1.0, mjm.nv)
    y = np.asarray(mjtpu.solve_m(m, d, jnp.asarray(x)))
    y_mj = np.zeros((1, mjm.nv))
    mujoco.mj_solveM(mjm, mjd, y_mj, x.reshape(1, -1))
    np.testing.assert_allclose(y, y_mj[0], atol=1e-10)
    # multi-rhs path
    x2 = np.stack([x, -0.5 * x])
    y2 = np.asarray(mjtpu.solve_m(m, d, jnp.asarray(x2)))
    y2_mj = np.zeros((2, mjm.nv))
    mujoco.mj_solveM(mjm, mjd, y2_mj, x2)
    np.testing.assert_allclose(y2, y2_mj, atol=1e-10)


def test_blocked_matches_dense():
  """Blocked factorization is numerically identical to the dense path
  (off-block entries of block-diagonal qM are exact zeros)."""
  mjm = mujoco.MjModel.from_xml_string(FOREST_XML)
  _, _, m, d = _forward_state(mjm)
  d_blocked = mjtpu.factor_m(m, d)
  from mjtpu._src import math as mjtpu_math

  qld_dense = mjtpu_math.safe_cholesky(d.qM)
  np.testing.assert_array_equal(
      np.asarray(d_blocked.qLD), np.asarray(qld_dense)
  )


def _run_traj_xml(xml, integrator, nsteps=100, tol=2e-8, seed=0):
  mjm = mujoco.MjModel.from_xml_string(
      xml.replace(
          '<option timestep="0.002"/>',
          f'<option timestep="0.002" integrator="{integrator}"/>',
      )
  )
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.05, 0.05, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.05, 0.05, mjm.nv)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  step = jax.jit(mjtpu.step)
  for i in range(nsteps):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    err = max(
        np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
        np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
    )
    assert err < tol, f"{integrator} diverged at step {i}: {err:.3e}"


def test_pile_blocked_equals_dense(monkeypatch):
  """32-body pile (nv=192, contacts active): the blocked path reproduces
  the dense factorization's trajectory (MJTPU_MASS_BLOCKS A/B)."""
  import pathlib

  xml_path = (
      pathlib.Path(__file__).parent.parent
      / "mjtpu" / "zoo" / "assets" / "scene_pile.xml"
  )
  mjm = mujoco.MjModel.from_xml_path(str(xml_path))
  m = mjtpu.put_model(mjm)
  assert smooth.mass_blocks(m) is not None
  assert len(smooth.mass_blocks(m)) == 32
  d0 = mjtpu.make_data(m)
  # drop everything 0.25 so the bottom layer penetrates the floor: contact
  # forces are nonzero from step one
  qpos = np.array(d0.qpos)
  qpos[2::7] -= 0.25
  d0 = d0.replace(qpos=jnp.asarray(qpos))

  # pin the B side to the plain dense Cholesky: with blocks off, the sparse
  # LDL auto-gate would otherwise engage (a pile is a forest of depth-6
  # chains) and this would compare blocked vs sparse instead
  monkeypatch.setenv("MJTPU_SPARSE_LDL", "0")
  monkeypatch.setenv("MJTPU_MASS_BLOCKS", "1")
  step_blocked = jax.jit(lambda mm, dd: mjtpu.step(mm, dd))
  db = step_blocked(m, d0)  # trace with blocks on
  monkeypatch.setenv("MJTPU_MASS_BLOCKS", "0")
  step_dense = jax.jit(lambda mm, dd: mjtpu.step(mm, dd))
  dn = step_dense(m, d0)  # trace with blocks off
  # one-step acceleration agreement is the sharp bug detector: a wrong
  # block mapping diverges O(1) immediately
  np.testing.assert_allclose(
      np.asarray(db.qacc), np.asarray(dn.qacc), atol=1e-9
  )
  for _ in range(19):
    db = step_blocked(m, db)
    dn = step_dense(m, dn)
  assert bool((np.asarray(db.contact.dist) < 0).any()), "contacts must engage"
  # blocked and dense factorizations are different summation orders; over
  # 20 steps of chaotic pile contact the ULP-level difference amplifies and
  # the growth rate is host-CPU-dependent (observed: 5e-8 qpos on one
  # machine, 3e-6 qvel on another, same jaxpr). The one-step qacc check
  # above is the correctness gate; this only pins "still on-trajectory".
  np.testing.assert_allclose(
      np.asarray(db.qpos), np.asarray(dn.qpos), atol=1e-4
  )
  np.testing.assert_allclose(
      np.asarray(db.qvel), np.asarray(dn.qvel), atol=1e-3
  )


def test_forest_trajectory_euler():
  """Euler w/ implicit joint damping goes through blocked factor_solve."""
  _run_traj_xml(FOREST_XML, "Euler")


def test_forest_trajectory_implicitfast():
  """ImplicitFast's LU solve goes through blocked factor_solve(sym=False)."""
  _run_traj_xml(FOREST_XML, "implicitfast")


def test_tendon_coupled_trajectory():
  """Tendons never merge blocks: cross-tree qM/qDeriv terms are masked to
  MuJoCo's chain sparsity (see tendon_armature), so a tendon coupling two
  trees still factors per-tree — this trajectory checks parity holds."""
  _run_traj_xml(TENDON_COUPLED_XML, "Euler")
  _run_traj_xml(TENDON_COUPLED_XML, "implicitfast")
