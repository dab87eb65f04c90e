"""Top-K broadphase compaction (<numeric name="max_geom_pairs">, same knob
as MJX) and the max_contact_points deepest-k cap.

The broadphase ranks each candidate group's pairs by sphere-bound distance
(plane groups: bound-sphere height above the plane) and narrowphases only
the K nearest; constraint assembly gathers geom ids per contact so the
compacted slots are fully dynamic.  Exact whenever at most K pairs of a
group are near contact — which the parity test exercises against C.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mjtpu
from mjtpu._src import collision_driver
from mjtpu._src.support import constraint_sizes

_PILE = """<mujoco>
  <option timestep="0.002"/>
  {custom}
  <worldbody>
    <geom type="plane" size="5 5 .1"/>
    <body pos="0 0 0.09"><freejoint/><geom type="sphere" size="0.1"/></body>
    <body pos="0 0 0.28"><freejoint/><geom type="sphere" size="0.1"/></body>
    <body pos="0 0.19 0.09"><freejoint/><geom type="sphere" size="0.1"/></body>
    <body pos="2 2 0.11"><freejoint/><geom type="sphere" size="0.1"/></body>
    <body pos="-2 2 0.11"><freejoint/><geom type="sphere" size="0.1"/></body>
    <body pos="2 -2 0.11"><freejoint/><geom type="sphere" size="0.1"/></body>
  </worldbody></mujoco>"""


def _load(custom: str):
  mjm = mujoco.MjModel.from_xml_string(_PILE.format(custom=custom))
  m = mjtpu.put_model(mjm)
  return mjm, m


def test_broadphase_shrinks_static_sizes():
  """max_geom_pairs caps every group's slot count (and with it nefc)."""
  _, m_full = _load("")
  _, m_bp = _load('<custom><numeric name="max_geom_pairs" data="4"/></custom>')
  # groups: sphere-sphere (15 pairs), plane-sphere (6 pairs) -> 4 + 4
  assert collision_driver.ncon(m_full) == 21
  assert collision_driver.ncon(m_bp) == 8
  assert constraint_sizes(m_bp)[3] < constraint_sizes(m_full)[3]


def test_broadphase_selects_nearest():
  """The K narrowphased pairs per group are the bound-distance top-k: the
  3 clustered spheres touch (plane + each other), the 3 far ones don't."""
  _, m = _load('<custom><numeric name="max_geom_pairs" data="4"/></custom>')
  d = mjtpu.fwd_position(m, mjtpu.make_data(m))
  dist = np.asarray(d.contact.dist)
  g1 = np.asarray(d.contact.geom1)
  g2 = np.asarray(d.contact.geom2)
  # every penetrating pair must have survived compaction: plane-s1,
  # plane-s3, s1-s2 (stacked), s1-s3 (side by side)
  pairs = {(int(a), int(b)) for a, b, dd in zip(g1, g2, dist) if dd < 0.0}
  assert pairs == {(0, 1), (0, 3), (1, 2), (1, 3)}, pairs


def test_broadphase_trajectory_parity():
  """With K >= touching pairs the compacted engine bit-tracks both the
  uncompacted engine and MuJoCo C over a 50-step settle."""
  mjm, m_bp = _load('<custom><numeric name="max_geom_pairs" data="6"/></custom>')
  _, m_full = _load("")
  mjd = mujoco.MjData(mjm)
  d_bp = mjtpu.make_data(m_bp)
  d_full = mjtpu.make_data(m_full)
  step_bp = jax.jit(mjtpu.step)
  step_full = jax.jit(mjtpu.step)
  for i in range(50):
    mujoco.mj_step(mjm, mjd)
    d_bp = step_bp(m_bp, d_bp)
    d_full = step_full(m_full, d_full)
    err_c = np.abs(np.asarray(d_bp.qpos) - mjd.qpos).max()
    err_f = np.abs(np.asarray(d_bp.qpos) - np.asarray(d_full.qpos)).max()
    assert err_c < 1e-8, f"step {i}: vs C {err_c:.3e}"
    assert err_f < 1e-12, f"step {i}: vs uncompacted {err_f:.3e}"


def test_max_contact_points_keeps_deepest():
  """The contact cap keeps the deepest-penetrating contacts (regression:
  the cap branch used to be dead code and the first slots in group order
  were kept instead, dropping real contacts)."""
  xml = """<mujoco>
    <custom><numeric name="max_contact_points" data="2"/></custom>
    <worldbody>
      <geom type="plane" size="3 3 .1"/>
      <body pos="0 0 0.05"><freejoint/><geom type="sphere" size="0.1"/></body>
      <body pos="0.5 0 0.06"><freejoint/><geom type="sphere" size="0.1"/></body>
      <body pos="1 0 0.04"><freejoint/><geom type="sphere" size="0.1"/></body>
    </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  d = mjtpu.fwd_position(m, mjtpu.make_data(m))
  dist = np.asarray(d.contact.dist)
  assert d.contact.dist.shape == (2,)
  assert d.contact.dim.shape == (2,)
  assert d.contact.geom1.shape == (2,)
  # deepest two of (-0.05, -0.04, -0.06) kept
  np.testing.assert_allclose(np.sort(dist), [-0.06, -0.05], atol=1e-12)
