"""Pallas TPU kernel: batched dense Cholesky factor + solve.

The BASELINE north-star names a Pallas batched factorization for
factor_m/solve_m (SURVEY.md §7 step 9, reference smooth.py:311-354).  The
TPU-native layout puts the env batch in the lane dimension: the working
matrix lives in VMEM as (n, n, TILE_B) so every scalar entry of the
factorization is a 128-wide lane vector — the column loop is sequential in
n (inherent to Cholesky) but every step is a fully vectorized VPU op over
the batch.  Pivots clamp at MINVAL exactly like math.safe_cholesky.

On by default on the TPU backend via mjtpu/ops/fused.chol_solve (disable
with MJTPU_PALLAS_CHOL=0; the env var is read at trace time).  Beyond the
XLA batched Cholesky it fuses the factor with both triangular solves in
one VMEM residency, and is the scaling path for big-nv scenes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MINVAL = 1e-15
_TILE_B = 128


def _chol_solve_kernel(a_ref, b_ref, x_ref):
  """One grid step: factor (n, n, TILE_B) and solve for (n, TILE_B).

  Loop indices select rows/columns via one-hot masks (Pallas TPU cannot
  dynamically slice loop-carried values)."""
  n = a_ref.shape[0]
  rows1 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)          # (n, 1)

  def factor_col(j, a):
    rowsel = (rows1 == j).astype(a.dtype)                          # (n, 1)
    col_j = jnp.sum(a * rowsel[None, :, :], axis=1)                # (n, B)
    minval = _MINVAL if a.dtype == jnp.float64 else 1e-9  # match safe_cholesky
    pivot = jnp.maximum(minval, jnp.sum(col_j * rowsel, axis=0))   # (B,)
    d = jnp.sqrt(pivot)
    below = (rows1 > j).astype(a.dtype)                            # (n, 1)
    col = col_j / d[None, :] * below + d[None, :] * rowsel         # (n, B)
    # trailing update then write column j
    a = a - col[:, None, :] * col[None, :, :]
    colmask = rowsel[None, :, :]                                   # (1, n, 1)
    a = a * (1.0 - colmask) + col[:, None, :] * colmask
    return a

  a = jax.lax.fori_loop(0, n, factor_col, a_ref[:])

  # zero the strictly-upper garbage left by the trailing updates
  rr = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
  cc = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
  a = a * (rr >= cc).astype(a.dtype)

  bvec = b_ref[:]

  def fwd(i, y):
    rowsel = (rows1 == i).astype(a.dtype)
    a_row = jnp.sum(a * rowsel[:, None, :], axis=0)                # (n, B)
    diag = jnp.sum(a_row * rowsel, axis=0)                         # (B,)
    b_i = jnp.sum(bvec * rowsel, axis=0)
    s = b_i - jnp.sum(a_row * y, axis=0)
    return y + rowsel * (s / diag)[None, :]

  y = jnp.zeros_like(bvec)
  y = jax.lax.fori_loop(0, n, fwd, y)

  def bwd(k, x):
    i = n - 1 - k
    rowsel = (rows1 == i).astype(a.dtype)
    a_col = jnp.sum(a * rowsel[None, :, :], axis=1)                # (n, B)
    diag = jnp.sum(a_col * rowsel, axis=0)
    y_i = jnp.sum(y * rowsel, axis=0)
    s = y_i - jnp.sum(a_col * x, axis=0)
    return x + rowsel * (s / diag)[None, :]

  x = jnp.zeros_like(y)
  x = jax.lax.fori_loop(0, n, bwd, x)
  x_ref[:] = x


@functools.partial(jax.jit, static_argnames=())
def cholesky_solve(mat: jax.Array, rhs: jax.Array) -> jax.Array:
  """Solves mat @ x = rhs for a batch: mat (B, n, n) SPD, rhs (B, n).

  Single fused Pallas kernel: factor + both triangular solves stay resident
  in VMEM; batch rides the lane dimension."""
  b, n = rhs.shape
  pad = (-b) % _TILE_B
  if pad:
    mat = jnp.concatenate(
        [mat, jnp.broadcast_to(jnp.eye(n, dtype=mat.dtype), (pad, n, n))]
    )
    rhs = jnp.concatenate([rhs, jnp.zeros((pad, n), rhs.dtype)])
  bt = mat.shape[0]

  # lanes-last layout
  a_t = jnp.transpose(mat, (1, 2, 0))  # (n, n, B)
  b_t = jnp.transpose(rhs, (1, 0))     # (n, B)

  grid = (bt // _TILE_B,)
  x_t = pl.pallas_call(
      _chol_solve_kernel,
      out_shape=jax.ShapeDtypeStruct((n, bt), mat.dtype),
      grid=grid,
      in_specs=[
          pl.BlockSpec((n, n, _TILE_B), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
          pl.BlockSpec((n, _TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((n, _TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
  )(a_t, b_t)
  x = jnp.transpose(x_t, (1, 0))
  return x[:b]
