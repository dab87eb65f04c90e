"""IO round-trips (reference test/io_test.py, device_test.py)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu
from tests.conftest import load_mj


def test_get_data_into_roundtrip():
  mjm = load_mj("spheres.xml")
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  step = jax.jit(mjtpu.step)
  for _ in range(300):
    d = step(m, d)
  out = mujoco.MjData(mjm)
  mjtpu.get_data_into(out, m, d)
  np.testing.assert_allclose(out.qpos, np.asarray(d.qpos), atol=1e-12)
  np.testing.assert_allclose(out.qvel, np.asarray(d.qvel), atol=1e-12)
  np.testing.assert_allclose(out.xpos, np.asarray(d.xpos), atol=1e-12)
  # settled spheres: two active floor contacts written back
  assert out.ncon >= 2
  assert (out.contact.dist[: out.ncon] < 0.01).all()


def test_get_data_into_batched():
  """Batched Data writes into a list of MjData (reference device.py's
  list-of-N path)."""
  mjm = load_mj("pendulum.xml")
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  qpos = jnp.stack([d.qpos + 0.1 * i for i in range(3)])
  dx = jax.vmap(lambda q: d.replace(qpos=q))(qpos)
  dx = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))(m, dx)
  outs = [mujoco.MjData(mjm) for _ in range(3)]
  mjtpu.get_data_into(outs, m, dx)
  for i, out in enumerate(outs):
    np.testing.assert_allclose(out.qpos, np.asarray(dx.qpos[i]), atol=1e-12)
  with pytest.raises(ValueError):
    mjtpu.get_data_into(outs[:2], m, dx)
  with pytest.raises(ValueError):
    mjtpu.get_data_into(outs[0], m, dx)


def test_put_data_roundtrip():
  mjm = load_mj("pendulum.xml")
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(0)
  mjd.qpos[:] = rng.uniform(-1, 1, mjm.nq)
  mjd.qvel[:] = rng.uniform(-1, 1, mjm.nv)
  m = mjtpu.put_model(mjm)
  d = mjtpu.put_data(m, mjd)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel)


def test_validation_rejects():
  # PGS is the one solver mjtpu (like the reference, README.md:121-141)
  # does not implement; implicit/implicitfast integrators ARE supported.
  xml = """<mujoco><option solver="PGS"/><worldbody>
    <body><joint type="hinge"/><geom type="sphere" size="0.1"/></body>
  </worldbody></mujoco>"""
  with pytest.raises(NotImplementedError):
    mjtpu.put_model(mujoco.MjModel.from_xml_string(xml))
  ok = """<mujoco><option integrator="implicit"/><worldbody>
    <body><joint type="hinge"/><geom type="sphere" size="0.1"/></body>
  </worldbody></mujoco>"""
  mjtpu.put_model(mujoco.MjModel.from_xml_string(ok))


def test_checkpoint_roundtrip(tmp_path):
  mjm = load_mj("pendulum.xml")
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = jax.jit(mjtpu.step)(m, d)
  path = str(tmp_path / "ckpt.npz")
  mjtpu.save_checkpoint(path, d)
  d2 = mjtpu.load_checkpoint(path, mjtpu.make_data(m))
  np.testing.assert_allclose(np.asarray(d2.qpos), np.asarray(d.qpos))
  # resume stepping from the checkpoint
  d3 = jax.jit(mjtpu.step)(m, d2)
  assert np.isfinite(np.asarray(d3.qpos)).all()
