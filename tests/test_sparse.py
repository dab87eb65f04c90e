"""Sparse tree-structured LDL (sparse.py) — parity vs dense and vs MuJoCo C.

The sparse path is the mj_factorM zero-fill-in schedule recast as static
levelwise rounds (reference keeps sparse LDL schedules, reference
smooth.py:311-354); these tests pin (a) exact solve parity against numpy
and the dense path, (b) trajectory parity vs C with the path forced on,
(c) the auto gate's chain/branchy discrimination."""

import os

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import pathlib

import mjtpu
from mjtpu._src import sparse

ZOO_ASSETS = pathlib.Path(__file__).parent.parent / "mjtpu" / "zoo" / "assets"


def load_humanoid():
  return mujoco.MjModel.from_xml_path(str(ZOO_ASSETS / "humanoid.xml"))


# limbs overlap geometrically (they all grow along +x); collisions are off —
# these fixtures exercise the factorization, not the colliders
_CAP = (
    '<geom type="capsule" fromto="0 0 0 0.1 0 0" size="0.02" mass="0.1"'
    ' contype="0" conaffinity="0"/>'
)


def _hinge_chain(links: int, prefix: str, damping: float) -> str:
  """Nested chain of `links` hinge bodies (innermost first)."""
  inner = ""
  for l in range(links - 1, -1, -1):
    inner = (
        f'<body name="{prefix}_{l}" pos="0.1 0 0">'
        f'<joint type="hinge" axis="0 1 0" damping="{damping}"/>'
        f"{_CAP}{inner}</body>"
    )
  return inner


def _branchy_xml(limbs=6, links=10, damping=0.1):
  """Free-floating trunk with `limbs` chains of `links` hinges:
  nv = 6 + limbs*links (66 by default), maxdepth = 6 + links."""
  arms = "".join(_hinge_chain(links, f"limb{a}", damping) for a in range(limbs))
  return f"""
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <body name="trunk" pos="0 0 2">
        <freejoint/>
        <geom type="sphere" size="0.15" mass="2"/>
        {arms}
      </body>
    </worldbody>
  </mujoco>
  """


def _chain_xml(links=40):
  """Fixed-base serial chain: nv = links, fully dense mass matrix."""
  return f"""
  <mujoco>
    <worldbody>
      <body pos="0 0 3">
        <geom type="sphere" size="0.05" mass="0.5" contype="0" conaffinity="0"/>
        {_hinge_chain(links, "c", 0.0)}
      </body>
    </worldbody>
  </mujoco>
  """


def test_factor_solve_parity_vs_numpy():
  """Sparse LDL solve == numpy dense solve on the humanoid mass matrix."""
  mjm = load_humanoid()
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(3)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.3, 0.3, mjm.nq)
  mujoco.mj_forward(mjm, mjd)
  M = np.zeros((mjm.nv, mjm.nv))
  mujoco.mj_fullM(mjm, mjd, M)

  s = sparse._build(mjm.nv, tuple(int(x) for x in mjm.dof_parentid))
  b = rng.standard_normal(mjm.nv)
  x = np.asarray(sparse.solve(s, sparse.factor(s, jnp.asarray(M)), jnp.asarray(b)))
  np.testing.assert_allclose(x, np.linalg.solve(M, b), rtol=1e-9, atol=1e-11)

  # multi-rhs
  B = rng.standard_normal((mjm.nv, 5))
  X = np.asarray(sparse.solve(s, sparse.factor(s, jnp.asarray(M)), jnp.asarray(B)))
  np.testing.assert_allclose(X, np.linalg.solve(M, B), rtol=1e-9, atol=1e-11)


def test_auto_gate_chain_vs_branchy():
  """AUTO keeps serial chains dense (no sparsity to exploit) and engages on
  branchy trees; '1' forces, '0' disables."""
  chain = mjtpu.put_model(mujoco.MjModel.from_xml_string(_chain_xml(40)))
  branchy = mjtpu.put_model(mujoco.MjModel.from_xml_string(_branchy_xml()))
  old = os.environ.pop("MJTPU_SPARSE_LDL", None)
  try:
    assert sparse.structure(chain) is None
    st = sparse.structure(branchy)
    assert st is not None and st.flops_sparse < 0.5 * st.flops_dense
    os.environ["MJTPU_SPARSE_LDL"] = "0"
    assert sparse.structure(branchy) is None
    os.environ["MJTPU_SPARSE_LDL"] = "1"
    assert sparse.structure(chain) is not None
  finally:
    os.environ.pop("MJTPU_SPARSE_LDL", None)
    if old is not None:
      os.environ["MJTPU_SPARSE_LDL"] = old


def test_branchy_trajectory_vs_c():
  """66-dof branchy tree: sparse path (auto-engaged) tracks MuJoCo C."""
  mjm = mujoco.MjModel.from_xml_string(_branchy_xml())
  m = mjtpu.put_model(mjm)
  assert sparse.structure(m) is not None, "auto gate should engage at nv=66"
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:] = np.random.default_rng(0).uniform(-0.3, 0.3, mjm.nv)
  d = mjtpu.make_data(m).replace(qvel=jnp.asarray(np.array(mjd.qvel)))
  step = jax.jit(lambda m_, d_: mjtpu.step(m_, d_))
  for i in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    err = max(
        np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
        np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
    )
    assert err < 1e-8, f"diverged at step {i}: {err:.3e}"


def test_humanoid_forced_sparse_matches_dense():
  """Same model, sparse forced vs dense forced: qacc match to 1e-10."""
  mjm = load_humanoid()
  m = mjtpu.put_model(mjm)
  rng = np.random.default_rng(1)
  d0 = mjtpu.make_data(m).replace(
      qpos=jnp.asarray(mjm.qpos0 + rng.uniform(-0.1, 0.1, mjm.nq)),
      qvel=jnp.asarray(rng.uniform(-0.5, 0.5, mjm.nv)),
  )
  old = os.environ.pop("MJTPU_SPARSE_LDL", None)
  try:
    os.environ["MJTPU_SPARSE_LDL"] = "1"
    d_sp = jax.jit(lambda m_, d_: mjtpu.forward(m_, d_))(m, d0)
    os.environ["MJTPU_SPARSE_LDL"] = "0"
    d_dn = jax.jit(lambda m_, d_: mjtpu.forward(m_, d_))(m, d0)
  finally:
    os.environ.pop("MJTPU_SPARSE_LDL", None)
    if old is not None:
      os.environ["MJTPU_SPARSE_LDL"] = old
  np.testing.assert_allclose(
      np.asarray(d_sp.qacc), np.asarray(d_dn.qacc), rtol=1e-8, atol=1e-10
  )
  np.testing.assert_allclose(
      np.asarray(d_sp.qacc_smooth), np.asarray(d_dn.qacc_smooth),
      rtol=1e-8, atol=1e-10,
  )


def test_implicit_integrator_sparse_path():
  """Eulerdamp/implicit factor_solve rides the sparse path: trajectory
  parity vs C on the branchy tree with joint damping (Euler + damping
  triggers the qM + h·D solve)."""
  mjm = mujoco.MjModel.from_xml_string(_branchy_xml(limbs=4, links=8))
  m = mjtpu.put_model(mjm)
  assert sparse.structure(m) is not None
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:] = np.random.default_rng(5).uniform(-0.5, 0.5, mjm.nv)
  d = mjtpu.make_data(m).replace(qvel=jnp.asarray(np.array(mjd.qvel)))
  step = jax.jit(lambda m_, d_: mjtpu.step(m_, d_))
  for i in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  err = max(
      np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
      np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
  )
  assert err < 1e-8, f"err {err:.3e}"
