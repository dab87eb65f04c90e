"""Pallas kernel correctness (CPU interpreter mode) — mjtpu/ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu


def test_pallas_cholesky_solve_interpret():
  from mjtpu.ops.cholesky import cholesky_solve

  rng = np.random.default_rng(0)
  B, n = 130, 11  # non-multiple of the tile to exercise padding
  A = rng.normal(size=(B, n, n))
  M = jnp.asarray(A @ A.transpose(0, 2, 1) + 5 * np.eye(n))
  b = jnp.asarray(rng.normal(size=(B, n)))
  with pltpu.force_tpu_interpret_mode():
    x = cholesky_solve(M, b)
  ref = np.linalg.solve(np.asarray(M), np.asarray(b)[..., None])[..., 0]
  np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-6, atol=1e-8)


def test_fused_chol_solve_seam():
  """custom_vmap seam: batched chol_solve == per-env base (CPU fallback)."""
  import numpy as np
  from mjtpu.ops import fused

  rng = np.random.default_rng(3)
  a = rng.normal(size=(8, 6, 6))
  h = jnp.asarray(a @ a.transpose(0, 2, 1) + 6 * np.eye(6))
  g = jnp.asarray(rng.normal(size=(8, 6)))
  x_b = jax.vmap(fused.chol_solve)(h, g)
  x_ref = jnp.stack([fused._base(h[i], g[i]) for i in range(8)])
  np.testing.assert_allclose(np.asarray(x_b), np.asarray(x_ref), rtol=1e-10)
  # unbatched operand broadcasting path
  x_c = jax.vmap(fused.chol_solve, in_axes=(None, 0))(h[0], g)
  x_cref = jnp.stack([fused._base(h[0], g[i]) for i in range(8)])
  np.testing.assert_allclose(np.asarray(x_c), np.asarray(x_cref), rtol=1e-10)


def _branchy_setup():
  import mujoco

  import mjtpu
  from mjtpu._src import sparse
  from tests.test_sparse import _branchy_xml

  mjm = mujoco.MjModel.from_xml_string(_branchy_xml())
  m = mjtpu.put_model(mjm)
  s = sparse.structure(m)
  assert s is not None
  rng = np.random.default_rng(0)
  mjd = mujoco.MjData(mjm)
  Ms, bs = [], []
  for _ in range(3):
    mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.3, 0.3, mjm.nq)
    mujoco.mj_forward(mjm, mjd)
    M = np.zeros((mjm.nv, mjm.nv))
    mujoco.mj_fullM(mjm, mjd, M)
    Ms.append(M)
    bs.append(rng.standard_normal(mjm.nv))
  return s, jnp.asarray(np.stack(Ms)), jnp.asarray(np.stack(bs))


def test_pallas_ldl_interpret():
  """Pallas sparse LDL == sparse.factor/solve on a 66-dof branchy tree.

  The kernel runs the identical levelwise schedule (gathers/scatters as
  one-hot MXU matmuls), so agreement is to summation-order rounding."""
  from mjtpu._src import sparse
  from mjtpu.ops import ldl

  s, Ms, bs = _branchy_setup()
  c = ldl.consts_for(s)
  S_ref = jnp.stack([sparse.factor(s, Mi) for Mi in Ms])
  x_ref = jnp.stack([sparse.solve(s, Si, bi) for Si, bi in zip(S_ref, bs)])
  rows = jnp.arange(s.nv)[:, None]
  Mc = jax.vmap(lambda M: M[rows, s.anc_clip] * jnp.asarray(s.mask, M.dtype))(Ms)
  with pltpu.force_tpu_interpret_mode():
    S_k = ldl.ldl_factor(c, Mc)
    x_k = ldl.ldl_solve(c, S_k, bs)
    x_f = ldl.ldl_factor_solve(c, Mc, bs)
  scale = float(jnp.abs(x_ref).max())
  np.testing.assert_allclose(np.asarray(S_k), np.asarray(S_ref), atol=1e-10)
  np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref),
                             atol=1e-12 * scale)
  np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                             atol=1e-12 * scale)


def test_ldl_seam_fallback():
  """custom_vmap LDL seams: batched == per-env base on the CPU fallback."""
  from mjtpu._src import sparse
  from mjtpu.ops import fused

  s, Ms, bs = _branchy_setup()
  S_b = jax.vmap(lambda M: fused.ldl_factor(s, M))(Ms)
  x_b = jax.vmap(lambda S, b: fused.ldl_solve(s, S, b))(S_b, bs)
  xf_b = jax.vmap(lambda M, b: fused.ldl_factor_solve(s, M, b))(Ms, bs)
  S_ref = jnp.stack([sparse.factor(s, Mi) for Mi in Ms])
  x_ref = jnp.stack([sparse.solve(s, Si, bi) for Si, bi in zip(S_ref, bs)])
  np.testing.assert_allclose(np.asarray(S_b), np.asarray(S_ref), rtol=1e-12)
  np.testing.assert_allclose(np.asarray(x_b), np.asarray(x_ref), rtol=1e-10)
  np.testing.assert_allclose(np.asarray(xf_b), np.asarray(x_ref), rtol=1e-10)
