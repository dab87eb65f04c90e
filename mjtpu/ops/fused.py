"""Engine bridge for the Pallas fused Cholesky factor+solve kernel.

The engine is written per-env and batched externally with jax.vmap
(reference solver.py:359-376 factors the dense Newton Hessian per env the
same way).  ``chol_solve`` is the seam: a ``custom_vmap`` whose base rule
is the plain per-env safe_cholesky + triangular solves, and whose batch
rule dispatches the whole batch to ``mjtpu.ops.cholesky.cholesky_solve`` —
one VMEM residency for factor + both solves, batch riding the lane
dimension.

On by default on the TPU backend (disable with MJTPU_PALLAS_CHOL=0),
outside differentiable mode (the kernel defines no autodiff rules) and for
nv small enough that the (nv, nv, 128) working set fits VMEM.  Measured on
one TPU v5 lite: humanoid B=4096 12.6M vs 11.4M env-steps/s; 20-link chain
(nv=40) B=256 0.39 vs 0.51 ms/step — identical trajectories.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from mjtpu._src import math
from mjtpu._src.diff_config import get_diff_config


def _base(h: jax.Array, g: jax.Array) -> jax.Array:
  return math.cho_solve(math.safe_cholesky(h), g)


def _pallas_enabled(n: int) -> bool:
  if os.environ.get("MJTPU_PALLAS_CHOL", "1") != "1":
    return False
  if n * n * 128 * 4 > 12 * 2**20:  # (n, n, TILE_B) working set must fit VMEM
    return False
  try:
    return jax.default_backend() == "tpu"
  except RuntimeError:
    return False


@jax.custom_batching.custom_vmap
def _chol_solve_cv(h: jax.Array, g: jax.Array) -> jax.Array:
  return _base(h, g)


@_chol_solve_cv.def_vmap
def _chol_solve_vmap(axis_size, in_batched, h, g):
  h_b, g_b = in_batched
  if h_b and g_b and h.ndim == 3 and g.ndim == 2 and _pallas_enabled(h.shape[-1]):
    from mjtpu.ops.cholesky import cholesky_solve

    return cholesky_solve(h, g), True
  # fallback: plain batched base rule (broadcast unbatched operands)
  if not h_b:
    h = jnp.broadcast_to(h, (axis_size,) + h.shape)
  if not g_b:
    g = jnp.broadcast_to(g, (axis_size,) + g.shape)
  return jax.vmap(_base)(h, g), True


def chol_solve(h: jax.Array, g: jax.Array) -> jax.Array:
  """Solves h @ x = g for one env: h (nv, nv) SPD, g (nv,).

  In differentiable mode this is the plain factor+solve (the custom_vmap
  primitive itself defines no JVP/transpose, so it must stay out of
  differentiated traces entirely — gating inside the vmap rule is not
  enough); otherwise the custom_vmap seam dispatches vmapped batches to
  the Pallas kernel."""
  if get_diff_config() is not None:
    return _base(h, g)
  return _chol_solve_cv(h, g)
