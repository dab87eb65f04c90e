"""GEOMDIST / GEOMNORMAL / GEOMFROMTO sensor parity vs MuJoCo C
(mj_geomDistance) — capability-plus; the reference has none of these.
Oracle-probed semantics: distmax = sensor cutoff (cutoff 0 reads 0);
body operands take the min over their geoms' pairs; the normal is
normalize(to - from), which flips under penetration."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu

XML = """<mujoco>
<worldbody>
  <body name="b1" pos="0 0 1"><freejoint/>
    <geom name="s1" type="sphere" size="0.1"/>
    <geom name="c1" type="capsule" size="0.05" fromto="0 0 0 0.3 0 0"/>
  </body>
  <body name="b2" pos="0.5 0 1"><freejoint/>
    <geom name="s2" type="sphere" size="0.08"/>
  </body>
  <geom name="floor" type="plane" size="3 3 .1"/>
  <body name="b3" pos="0 0.5 0.2"><freejoint/>
    <geom name="box3" type="box" size="0.06 0.05 0.04"/>
  </body>
</worldbody>
<sensor>
  <distance geom1="s1" geom2="s2" cutoff="2"/>
  <distance geom1="s1" geom2="s2"/>
  <distance body1="b1" body2="b2" cutoff="1.5"/>
  <distance geom1="floor" geom2="s2" cutoff="3"/>
  <distance geom1="box3" geom2="s1" cutoff="2"/>
  <normal geom1="s1" geom2="s2" cutoff="2"/>
  <normal body1="b1" body2="b2" cutoff="1.5"/>
  <fromto geom1="s1" geom2="s2" cutoff="2"/>
  <fromto body1="b1" body2="b2" cutoff="1.5"/>
  <fromto geom1="floor" geom2="box3" cutoff="3"/>
</sensor>
</mujoco>"""


def _compare(qpos_update=None, atol=1e-9):
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  if qpos_update:
    for i, v in qpos_update.items():
      mjd.qpos[i] = v
  mujoco.mj_forward(mjm, mjd)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m).replace(qpos=jnp.asarray(np.array(mjd.qpos)))
  d = jax.jit(mjtpu.forward)(m, d)
  np.testing.assert_allclose(
      np.asarray(d.sensordata), mjd.sensordata, atol=atol
  )
  return mjd


def test_geomdist_separated():
  mjd = _compare()
  assert abs(mjd.sensordata[0] - 0.32) < 1e-12  # sphere gap
  assert mjd.sensordata[1] == 0.0  # cutoff 0 -> distmax 0 -> reads 0


def test_geomdist_penetrating():
  # drive b2 into b1 (slightly off the capsule axis so the contact normal
  # is well-defined): sphere centers ~0.153 apart, radii 0.1+0.08 -> dist<0
  mjd = _compare({7: 0.15, 8: 0.03})
  assert mjd.sensordata[0] < 0


def test_geomdist_trajectory():
  """Falling box over the plane: sensors track C through contact."""
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  step = jax.jit(mjtpu.step)
  for i in range(80):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    np.testing.assert_allclose(
        np.asarray(d.sensordata), mjd.sensordata, atol=1e-7,
        err_msg=f"step {i}",
    )
