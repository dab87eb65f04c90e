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


def test_get_data_into_sorted_contacts():
  """sort_contacts=True emits contacts in canonical (geom1, geom2) order,
  making mjData-level C diffs deterministic even when the engine's
  collider-group order differs from C's collision-function order."""
  mjm = load_mj("spheres.xml")
  mjd = mujoco.MjData(mjm)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  step = jax.jit(mjtpu.step)
  for _ in range(300):  # settle onto the floor (>=2 active contacts)
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)

  out = mujoco.MjData(mjm)
  mjtpu.get_data_into(out, m, d, sort_contacts=True)
  assert out.ncon == mjd.ncon and out.ncon >= 2

  keys = list(zip(out.contact.geom1[: out.ncon], out.contact.geom2[: out.ncon]))
  assert keys == sorted(keys), f"not in canonical order: {keys}"

  # canonical order makes per-row C comparison pairing-free: sort C's
  # contacts the same way and diff row-by-row
  c_order = np.lexsort((
      mjd.contact.dist[: mjd.ncon],
      mjd.contact.geom2[: mjd.ncon],
      mjd.contact.geom1[: mjd.ncon],
  ))
  np.testing.assert_array_equal(
      out.contact.geom1[: out.ncon], mjd.contact.geom1[c_order])
  np.testing.assert_array_equal(
      out.contact.geom2[: out.ncon], mjd.contact.geom2[c_order])
  np.testing.assert_allclose(
      out.contact.dist[: out.ncon], mjd.contact.dist[c_order], atol=1e-9)
  np.testing.assert_allclose(
      out.contact.pos[: out.ncon], mjd.contact.pos[c_order], atol=1e-8)
  # efc_address still points at each contact's compacted efc rows
  for k in range(out.ncon):
    a = out.contact.efc_address[k]
    if a >= 0:
      assert out.efc_id[a] == k


def _dense_j(out, nv):
  """Reconstruct dense efc_J from an MjData (sparse or dense storage)."""
  if out.efc_J.size == out.nefc * nv:  # dense layout (mj_isSparse false),
    return out.efc_J.reshape(out.nefc, nv)  # or our packed full-rows write
  j = np.zeros((out.nefc, nv))
  for r in range(out.nefc):
    nnz, adr = out.efc_J_rownnz[r], out.efc_J_rowadr[r]
    j[r, out.efc_J_colind[adr : adr + nnz]] = out.efc_J[adr : adr + nnz]
  return j


@pytest.mark.parametrize("name", ["spheres.xml", "elliptic.xml", "equality.xml"])
def test_get_data_into_efc(name):
  """efc rows written back into MjData match C's own rows after stepping
  both engines in lockstep (reference device_get_into writes nefc + efc
  arrays, device.py:1119-1206).  Contact rows are compared as order-free
  aggregates (contact ordering differs between the engines)."""
  mjm = load_mj(name)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(2)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.05, 0.05, mjm.nq)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m).replace(qpos=jnp.asarray(np.array(mjd.qpos)))
  step = jax.jit(mjtpu.step)
  for _ in range(50):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)

  out = mujoco.MjData(mjm)
  mjtpu.get_data_into(out, m, d)

  assert out.nefc == mjd.nefc, (out.nefc, mjd.nefc)
  assert (out.ne, out.nf, out.nl) == (mjd.ne, mjd.nf, mjd.nl)
  assert out.ncon == mjd.ncon
  assert out.solver_niter[0] > 0

  # non-contact rows: one-to-one (same static order as C)
  ncs = out.ne + out.nf + out.nl
  for field in ("efc_pos", "efc_margin", "efc_D", "efc_aref", "efc_force",
                "efc_frictionloss"):
    np.testing.assert_allclose(
        getattr(out, field)[:ncs], getattr(mjd, field)[:ncs], atol=1e-8,
        err_msg=field)
  np.testing.assert_array_equal(out.efc_type[:ncs], mjd.efc_type[:ncs])
  np.testing.assert_array_equal(out.efc_id[:ncs], mjd.efc_id[:ncs])

  # contact rows: order-free — qfrc_constraint and force-magnitude multiset
  j_out, j_mj = _dense_j(out, m.nv), _dense_j(mjd, m.nv)
  np.testing.assert_allclose(
      j_out.T @ out.efc_force, j_mj.T @ mjd.efc_force, atol=1e-6)
  np.testing.assert_allclose(
      np.sort(out.efc_force[ncs:]), np.sort(mjd.efc_force[ncs:]), atol=1e-6)
  # contact efc_address points at that contact's rows in the compacted efc
  for k in range(out.ncon):
    a = out.contact.efc_address[k]
    if a >= 0:
      assert out.efc_id[a] == k
      assert out.efc_type[a] >= int(
          mujoco.mjtConstraint.mjCNSTR_CONTACT_FRICTIONLESS)


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
