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
