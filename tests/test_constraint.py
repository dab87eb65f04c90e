"""Per-row constraint-assembly parity vs MuJoCo C.

Reference capability map: test/constraint_test.py — efc_J/efc_D/efc_aref/
efc_frictionloss row parity via the nnz-row filter (its :63-87), per-type
instantiation unit checks, refsafe. Our static row layout matches C's
ordering (equality | friction | limit | contact), and inactive rows zero
their Jacobians, so active rows align one-to-one after filtering — except
contacts, whose ordering can differ (we sort by condim); those are checked
through ordering-free aggregates that fully determine the solver problem.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu
from tests.conftest import load_mj

# models exercising each constraint type over a mj-driven trajectory
MODELS = [
    "equality.xml",        # connect/weld/joint equality
    "weld.xml",
    "friction_tendon.xml", # dof+tendon frictionloss, limits
    "cartpole.xml",        # joint limits
    "spheres.xml",         # condim3 contacts
    "condim4_pyramidal.xml",
    "condim4_elliptic.xml",
    "condim6_elliptic.xml",
]

EPS = 1e-8


def _mj_efc_dense(mjm, mjd):
  """C-side efc_J as a dense (nefc, nv) array."""
  if mujoco.mj_isSparse(mjm):
    j = np.zeros((mjd.nefc, mjm.nv))
    mujoco.mju_sparse2dense(
        j, mjd.efc_J, mjd.efc_J_rownnz, mjd.efc_J_rowadr, mjd.efc_J_colind
    )
    return j
  return np.array(mjd.efc_J).reshape(mjd.nefc, mjm.nv)


def _setup(name, seed):
  mjm = load_mj(name)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.1, 0.1, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.3, 0.3, mjm.nv)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  return mjm, mjd, m, d


def _our_efc(m, d, mjd):
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)), qvel=jnp.asarray(np.array(mjd.qvel))
  )
  return mjtpu.fwd_position(m, d)


def _check_rows(tag, mjm, mjd, m, d):
  """Active efc rows match C one-to-one (non-contact) / as aggregates."""
  from mjtpu._src.support import constraint_sizes

  ne_s, nf_s, nl_s, _, _ = constraint_sizes(m)
  start_con = ne_s + nf_s + nl_s

  mj_j = _mj_efc_dense(mjm, mjd)
  our_j = np.asarray(d.efc_J)
  mj_nnz = np.abs(mj_j).max(axis=1) > EPS if mjd.nefc else np.zeros(0, bool)
  our_nnz = np.abs(our_j).max(axis=1) > EPS

  # C splits at (ne, nf, nl) — all its rows are active
  ne, nf, nl = mjd.ne, mjd.nf, mjd.nl

  sel_our = our_nnz.copy()
  sel_our[start_con:] = False
  sel_mj = mj_nnz.copy()
  sel_mj[ne + nf + nl:] = False
  np.testing.assert_allclose(
      mj_j[sel_mj], our_j[:start_con][sel_our[:start_con]],
      atol=1e-9, err_msg=f"{tag}: efc_J (non-contact)"
  )
  for field, mj_field in (
      ("efc_D", mjd.efc_D), ("efc_aref", mjd.efc_aref),
      ("efc_pos", mjd.efc_pos), ("efc_margin", mjd.efc_margin),
      ("efc_frictionloss", mjd.efc_frictionloss),
  ):
    ours = np.asarray(getattr(d, field))[:start_con][sel_our[:start_con]]
    np.testing.assert_allclose(
        np.array(mj_field)[sel_mj], ours, atol=1e-8,
        err_msg=f"{tag}: {field} (non-contact)"
    )

  # --- contact rows: ordering-free aggregates --------------------------
  con_mj = slice(ne + nf + nl, mjd.nefc)
  jc_mj, jc_our = mj_j[con_mj], our_j[start_con:]
  d_mj = np.array(mjd.efc_D)[con_mj]
  d_our = np.asarray(d.efc_D)[start_con:]
  aref_mj = np.array(mjd.efc_aref)[con_mj]
  aref_our = np.asarray(d.efc_aref)[start_con:]
  # Gram matrix J^T diag(D) J and vector J^T diag(D) aref determine the
  # quadratic solver objective; equal aggregates == equal physics
  np.testing.assert_allclose(
      jc_mj.T @ (d_mj[:, None] * jc_mj),
      jc_our.T @ (d_our[:, None] * jc_our),
      atol=1e-6, err_msg=f"{tag}: contact J'DJ"
  )
  np.testing.assert_allclose(
      jc_mj.T @ (d_mj * aref_mj), jc_our.T @ (d_our * aref_our),
      atol=1e-6, err_msg=f"{tag}: contact J'D aref"
  )


@pytest.mark.parametrize("name", MODELS)
def test_efc_rows(name):
  mjm, mjd, m, d0 = _setup(name, seed=3)
  for i in range(12):
    for _ in range(3):
      mujoco.mj_step(mjm, mjd)
    mujoco.mj_forward(mjm, mjd)
    d = _our_efc(m, d0, mjd)
    _check_rows(f"{name} step {i}", mjm, mjd, m, d)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_efc_rows(seed):
  """Per-row efc parity on fuzzed MJCFs (reference constraint_test.py:37-106
  runs the same nnz-row comparison over its TEST_FILES fuzz corpus)."""
  from mjtpu._src.test_util import create_mjcf

  xml = create_mjcf(
      seed + 40,
      frictionloss=(seed % 2 == 0),
      tendons=(seed % 2 == 1),
      equality=True,
      geom_types=("sphere", "capsule"),
  )
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.08, 0.08, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.3, 0.3, mjm.nv)
  try:
    m = mjtpu.put_model(mjm)
  except NotImplementedError as e:
    pytest.skip(f"unsupported fuzz feature: {e}")
  d0 = mjtpu.make_data(m)
  for i in range(6):
    for _ in range(5):
      mujoco.mj_step(mjm, mjd)
    mujoco.mj_forward(mjm, mjd)
    d = _our_efc(m, d0, mjd)
    _check_rows(f"fuzz seed {seed} step {i}", mjm, mjd, m, d)


def test_condim1_normal_only():
  """condim=1 contacts instantiate exactly one frictionless normal row
  (reference constraint_test.py:303-338)."""
  xml = """<mujoco><worldbody>
    <geom type="plane" size="3 3 .1" condim="1"/>
    <body pos="0 0 0.05"><freejoint/>
      <geom type="sphere" size="0.1" condim="1"/></body>
  </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.fwd_position(m, mjtpu.make_data(m))
  assert mjd.ncon == 1 and mjd.nefc == 1
  j = np.asarray(d.efc_J)
  active = np.abs(j).max(axis=1) > EPS
  assert active.sum() == 1
  # normal row only: J = contact normal (z) against the free body's linear dofs
  np.testing.assert_allclose(j[active][0], _mj_efc_dense(mjm, mjd)[0], atol=1e-9)
  _check_rows("condim1", mjm, mjd, m, d)
  # and the full step stays on C's trajectory
  dj = mjtpu.make_data(m)
  step = jax.jit(mjtpu.step)
  mjd2 = mujoco.MjData(mjm)
  for i in range(40):
    mujoco.mj_step(mjm, mjd2)
    dj = step(m, dj)
  np.testing.assert_allclose(np.asarray(dj.qpos), mjd2.qpos, atol=1e-8)


def test_mixed_condim():
  """One scene mixing condim 1/3/4/6 geoms: per-state row parity and
  trajectory parity (reference constraint_test.py:339-368)."""
  xml = """<mujoco>
  <option cone="elliptic"/>
  <worldbody>
    <geom type="plane" size="5 5 .1" condim="1"/>
    <body pos="0 0 0.08"><freejoint/>
      <geom type="sphere" size="0.1" condim="1"/></body>
    <body pos="0.5 0 0.08"><freejoint/>
      <geom type="sphere" size="0.1" condim="3"/></body>
    <body pos="1.0 0 0.08"><freejoint/>
      <geom type="sphere" size="0.1" condim="4" friction="1 .01 .001"/></body>
    <body pos="1.5 0 0.08"><freejoint/>
      <geom type="sphere" size="0.1" condim="6" friction="1 .01 .001"/></body>
  </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  assert mjd.nefc == 1 + 3 + 4 + 6
  m = mjtpu.put_model(mjm)
  d = mjtpu.fwd_position(m, mjtpu.make_data(m))
  _check_rows("mixed condim", mjm, mjd, m, d)

  dj = mjtpu.make_data(m)
  step = jax.jit(mjtpu.step)
  mjd2 = mujoco.MjData(mjm)
  rng = np.random.default_rng(0)
  mjd2.qvel[:] = rng.uniform(-0.2, 0.2, mjm.nv)
  dj = dj.replace(qvel=jnp.asarray(np.array(mjd2.qvel)))
  for i in range(50):
    mujoco.mj_step(mjm, mjd2)
    dj = step(m, dj)
    err = max(np.abs(np.asarray(dj.qpos) - mjd2.qpos).max(),
              np.abs(np.asarray(dj.qvel) - mjd2.qvel).max())
    assert err < 1e-6, f"mixed-condim diverged at step {i}: {err:.3e}"


def test_condim6_rolling_rows():
  """condim=6 elliptic contacts carry torsional+rolling rows whose
  Jacobians act on angular dofs (reference constraint_test.py:517-535)."""
  mjm = load_mj("condim6_elliptic.xml")
  mjd = mujoco.MjData(mjm)
  mjd.qpos[2] = 0.095  # sphere (r=0.1) pressed into the floor
  mujoco.mj_forward(mjm, mjd)
  ncon = mjd.ncon
  assert ncon >= 1 and mjd.nefc == 6 * ncon
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(qpos=jnp.asarray(np.array(mjd.qpos)))
  d = mjtpu.fwd_position(m, d)
  _check_rows("condim6 rows", mjm, mjd, m, d)
  # rolling rows (last 2 of each contact) touch only angular dofs (3:6 of
  # the free joint) — structural property, same as C
  j = np.asarray(d.efc_J)
  active = np.abs(j).max(axis=1) > EPS
  jc = j[active].reshape(ncon, 6, -1)
  np.testing.assert_allclose(jc[:, 4:, :3], 0.0, atol=1e-12)
  assert np.abs(jc[:, 4:, 3:]).max() > 0.1


def test_jnt_range_row():
  """A violated hinge limit instantiates one row with J = ±1 at its dof."""
  xml = """<mujoco><worldbody><body>
    <joint name="h" type="hinge" range="-0.1 0.1" limited="true"/>
    <geom size="0.1"/></body></worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(qpos=jnp.array([0.3]))  # beyond +0.1 limit
  d = mjtpu.fwd_position(m, d)
  j = np.asarray(d.efc_J)
  rows = np.abs(j).max(axis=1) > EPS
  assert rows.sum() == 1
  np.testing.assert_allclose(j[rows][0, 0], -1.0)
  assert float(np.asarray(d.efc_pos)[rows][0]) < 0


def test_frictionloss_row():
  """A dof with frictionloss instantiates a row with J=1, pos=0."""
  xml = """<mujoco><worldbody><body>
    <joint type="slide" frictionloss="2.0"/>
    <geom size="0.1"/></body></worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = mjtpu.fwd_position(m, d)
  fl = np.asarray(d.efc_frictionloss)
  rows = fl > 0
  assert rows.sum() == 1
  np.testing.assert_allclose(fl[rows], [2.0])
  np.testing.assert_allclose(np.asarray(d.efc_pos)[rows], [0.0], atol=1e-12)
  np.testing.assert_allclose(np.abs(np.asarray(d.efc_J)[rows]).max(), 1.0)


def test_refsafe():
  """timeconst clamps to 2*timestep when refsafe is on (mj KBI transform)."""
  xml = """<mujoco><option timestep="0.05"/><worldbody><body>
    <joint type="hinge" range="-0.1 0.1" limited="true"
           solreflimit="0.02 1"/>
    <geom size="0.1"/></body></worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[0] = 0.3
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m).replace(qpos=jnp.array([0.3]))
  d = mjtpu.fwd_position(m, d)
  rows = np.abs(np.asarray(d.efc_J)).max(axis=1) > EPS
  np.testing.assert_allclose(
      np.asarray(d.efc_aref)[rows], np.array(mjd.efc_aref), atol=1e-10
  )


def test_ball_limit_zero_rotation_margin():
  """Ball limit row live at zero rotation (tiny range + margin): C's
  mju_normalize3 leaves the degenerate axis at (1,0,0); the row must
  match, not silently zero out (found by a margin-band verify drive)."""
  xml = """<mujoco><worldbody><body pos="0 0 1">
    <joint type="ball" range="0 0.4" limited="true" margin="0.01"/>
    <geom type="capsule" size="0.05" fromto="0 0 0 0.3 0 0"/>
    </body></worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:] = [0.1, -0.2, 0.15]
  mujoco.mj_forward(mjm, mjd)
  assert mjd.nefc == 1  # the limit row IS active inside the margin band
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(qvel=jnp.asarray(np.array(mjd.qvel)))
  d = mjtpu.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-10)
  # the J row carries C's degenerate-input default axis
  j = np.asarray(d.efc_J)
  live = np.abs(j).max(axis=1) > EPS
  assert live.sum() == 1
  np.testing.assert_allclose(j[live][0], [-1.0, 0.0, 0.0], atol=1e-12)


def test_limit_rows_batched_order():
  """Interleaved ball and hinge limited joints keep mj row order after
  the per-category batching + static permutation."""
  xml = """<mujoco><worldbody><body pos="0 0 1">
    <joint type="ball" range="0 30" limited="true"/>
    <geom type="capsule" size="0.05" fromto="0 0 0 0.3 0 0"/>
    <body pos="0.3 0 0">
      <joint type="hinge" axis="0 1 0" range="-20 20" limited="true"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.2 0 0"/>
      <body pos="0.2 0 0">
        <joint type="ball" range="0 25" limited="true"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0.15 0 0"/>
      </body>
    </body>
    </body></worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  # place every joint past its limit: all 7 potential rows live
  axis = np.array([0.3, -0.5, 0.81])
  axis /= np.linalg.norm(axis)
  mujoco.mju_axisAngle2Quat(mjd.qpos[0:4], axis, np.deg2rad(35.0))
  mjd.qpos[4] = np.deg2rad(25.0)
  mujoco.mju_axisAngle2Quat(mjd.qpos[5:9], -axis, np.deg2rad(28.0))
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(qpos=jnp.asarray(np.array(mjd.qpos)))
  d = mjtpu.forward(m, d)
  j = np.asarray(d.efc_J)
  live = np.abs(j).max(axis=1) > EPS
  assert mjd.nefc == live.sum() == 3
  np.testing.assert_allclose(np.asarray(d.efc_pos)[live], mjd.efc_pos, atol=1e-10)
  np.testing.assert_allclose(j[live], mjd.efc_J.reshape(mjd.nefc, -1), atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-8)
