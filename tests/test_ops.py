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
