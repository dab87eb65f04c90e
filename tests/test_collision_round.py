"""Round-geom (cylinder/ellipsoid) convex-hull colliders.

Capability-plus over the reference (its README excludes Ellipsoid/Cylinder
geoms, SURVEY.md §2.6).  Non-plane/sphere cylinder/ellipsoid pairs route
through the convex SAT path on trace-time inscribed hulls
(mjtpu/_src/mesh.py cylinder()/ellipsoid()), the same meshification MJX
applies — so contacts are compared to MuJoCo C (MPR on exact surfaces) with
a hull-chord tolerance instead of the analytic colliders' 1e-8.

Inscribed-hull depth error bounds used below:
  cylinder nseg=16: r*(1-cos(pi/16)) ~ 1.9% of r
  ellipsoid nvert=32: chord sagitta at ~38deg point spacing, up to ~6% of r
"""

import mujoco
import numpy as np
import pytest

import mjtpu

# geom1 fixed in world, geom2 on a free body, in shallow penetration
SCENES = {
    "capsule_cylinder": """<mujoco><worldbody>
      <geom type="cylinder" size="0.1 0.15"/>
      <body pos="0.165 0 0.02" euler="90 0 0"><freejoint/>
        <geom type="capsule" size="0.08 0.15"/></body>
      </worldbody></mujoco>""",
    "capsule_ellipsoid": """<mujoco><worldbody>
      <geom type="ellipsoid" size="0.1 0.12 0.15"/>
      <body pos="0.16 0 0.02" euler="90 0 0"><freejoint/>
        <geom type="capsule" size="0.08 0.15"/></body>
      </worldbody></mujoco>""",
    "sphere_ellipsoid": """<mujoco><worldbody>
      <geom type="ellipsoid" size="0.1 0.12 0.15"/>
      <body pos="0.17 0.01 0.02"><freejoint/>
        <geom type="sphere" size="0.09"/></body>
      </worldbody></mujoco>""",
    "cylinder_box": """<mujoco><worldbody>
      <geom type="box" size="0.15 0.15 0.1"/>
      <body pos="0.02 0.01 0.19" euler="0 90 0"><freejoint/>
        <geom type="cylinder" size="0.1 0.2"/></body>
      </worldbody></mujoco>""",
    "cylinder_cylinder": """<mujoco><worldbody>
      <geom type="cylinder" size="0.1 0.2" euler="0 90 0"/>
      <body pos="0 0.02 0.19" euler="90 0 0"><freejoint/>
        <geom type="cylinder" size="0.1 0.2"/></body>
      </worldbody></mujoco>""",
    "ellipsoid_box": """<mujoco><worldbody>
      <geom type="box" size="0.15 0.15 0.1"/>
      <body pos="0.02 0.01 0.2" euler="10 20 0"><freejoint/>
        <geom type="ellipsoid" size="0.08 0.1 0.12"/></body>
      </worldbody></mujoco>""",
    "ellipsoid_ellipsoid": """<mujoco><worldbody>
      <geom type="ellipsoid" size="0.1 0.12 0.15"/>
      <body pos="0.16 0.01 0.03" euler="0 30 0"><freejoint/>
        <geom type="ellipsoid" size="0.08 0.1 0.12"/></body>
      </worldbody></mujoco>""",
    "ellipsoid_cylinder": """<mujoco><worldbody>
      <geom type="cylinder" size="0.1 0.15"/>
      <body pos="0.17 0 0.02" euler="0 20 0"><freejoint/>
        <geom type="ellipsoid" size="0.08 0.1 0.12"/></body>
      </worldbody></mujoco>""",
    "cylinder_mesh": """<mujoco>
      <asset><mesh name="tetra"
        vertex="0.1 0 -0.07  -0.05 0.0866 -0.07  -0.05 -0.0866 -0.07  0 0 0.1"/>
      </asset><worldbody>
      <geom type="mesh" mesh="tetra"/>
      <body pos="0 0 0.15" euler="0 90 0"><freejoint/>
        <geom type="cylinder" size="0.08 0.15"/></body>
      </worldbody></mujoco>""",
    "hfield_cylinder": """<mujoco>
      <asset><hfield name="hf" nrow="8" ncol="8" size="1 1 0.2 0.05"/></asset>
      <worldbody>
      <geom type="hfield" hfield="hf"/>
      <body pos="0 0 0.09" euler="0 90 0"><freejoint/>
        <geom type="cylinder" size="0.1 0.15"/></body>
      </worldbody></mujoco>""",
    "hfield_ellipsoid": """<mujoco>
      <asset><hfield name="hf" nrow="8" ncol="8" size="1 1 0.2 0.05"/></asset>
      <worldbody>
      <geom type="hfield" hfield="hf"/>
      <body pos="0 0 0.1"><freejoint/>
        <geom type="ellipsoid" size="0.08 0.1 0.12"/></body>
      </worldbody></mujoco>""",
}


def _contacts(xml):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = mjtpu.fwd_position(m, d)
  return mjm, mjd, m, d


@pytest.mark.parametrize("name", sorted(SCENES))
def test_round_pair_contact(name):
  mjm, mjd, m, d = _contacts(SCENES[name])
  assert mjd.ncon > 0, f"{name}: C scene produced no contact (bad fixture)"

  dist = np.asarray(d.contact.dist)
  assert (dist < 0).any(), f"{name}: no penetrating contact found"

  # deepest depth within the inscribed-hull chord tolerance of C's
  ours = float(dist.min())
  c_depth = float(mjd.contact.dist.min())
  assert ours <= c_depth + 0.012, f"{name}: too shallow {ours} vs C {c_depth}"
  assert ours >= c_depth - 0.03, f"{name}: too deep {ours} vs C {c_depth}"

  # normal of our deepest contact roughly aligned with C's
  i = int(np.argmin(dist))
  pos_ours = np.asarray(d.contact.pos)[i]
  j = int(np.argmin(np.linalg.norm(mjd.contact.pos - pos_ours, axis=1)))
  n_ours = np.asarray(d.contact.frame)[i].reshape(3, 3)[0]
  n_mj = np.array(mjd.contact.frame[j]).reshape(3, 3)[0]
  assert abs(float(n_ours @ n_mj)) > 0.95, (
      f"{name}: normal mismatch {n_ours} vs {n_mj}"
  )


@pytest.mark.parametrize("name", sorted(SCENES))
def test_round_pair_separated(name):
  """Moved far apart, the hull colliders report no active contact."""
  mjm = mujoco.MjModel.from_xml_string(SCENES[name])
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  import jax.numpy as jnp

  qpos = np.array(d.qpos)
  qpos[2] += 5.0  # free-body z
  d = d.replace(qpos=jnp.asarray(qpos, dtype=d.qpos.dtype))
  d = mjtpu.fwd_position(m, d)
  dist = np.asarray(d.contact.dist)
  assert (dist > 0).all(), f"{name}: phantom contact when separated"


def test_cylinder_drop_trajectory():
  """A cylinder dropped on a box settles finite and resting (plausibility,
  not bit-parity: C integrates MPR contacts on the exact surface, the hull
  path is geometrically offset by the chord sagitta)."""
  xml = """<mujoco><option timestep="0.005"/><worldbody>
      <geom type="box" size="0.5 0.5 0.1"/>
      <body pos="0 0 0.4" euler="0 80 0"><freejoint/>
        <geom type="cylinder" size="0.08 0.15"/></body>
      </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  import jax

  step = jax.jit(mjtpu.step)
  for _ in range(300):
    d = step(m, d)
  qpos = np.asarray(d.qpos)
  assert np.isfinite(qpos).all()
  # resting on the box top (z in [0.07, 0.25]), not sunk or exploded
  assert 0.0 < qpos[2] < 0.4
  assert float(np.abs(np.asarray(d.qvel)).max()) < 0.5
