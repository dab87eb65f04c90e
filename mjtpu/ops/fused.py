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

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

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


# -----------------------------------------------------------------------------
# tree-sparse LDL seams (Pallas batched sparse factorization, ops/ldl.py)
# -----------------------------------------------------------------------------


_PALLAS_LDL_MIN_NV = 40


def _ldl_enabled(nv: int) -> bool:
  """MJTPU_PALLAS_LDL = auto (default) | 1 (force) | 0 (off), trace-time.

  The auto gate engages only for big trees: measured on TPU v5 lite, the
  kernel is 1.6x a full step on a 66-dof branchy tree at B=1024 but ~20%
  slower on the 23-dof humanoid, where XLA's fused elementwise levelwise
  path beats the one-hot-matmul formulation's fixed overhead."""
  knob = os.environ.get("MJTPU_PALLAS_LDL", "auto")
  if knob == "0":
    return False
  if knob != "1" and nv < _PALLAS_LDL_MIN_NV:
    return False
  try:
    return jax.default_backend() == "tpu"
  except RuntimeError:
    return False


def _structure_key(s) -> tuple[int, tuple[int, ...]]:
  # anc row i = [pad..., root, ..., parent, i]: parent sits at column D-2
  parentid = tuple(
      int(s.anc[i, s.depth - 2]) if s.depth > 1 and s.anc[i, s.depth - 2] < s.nv
      else -1
      for i in range(s.nv)
  )
  return s.nv, parentid


@functools.lru_cache(maxsize=32)
def _ldl_seams(nv: int, parentid: tuple[int, ...]):
  """custom_vmap wrappers for one tree structure: per-env base rules are
  sparse.factor/solve; vmapped batches dispatch to the Pallas kernels."""
  from mjtpu._src import sparse
  from mjtpu.ops import ldl as ldl_mod

  s = sparse._build(nv, parentid)
  rows = np.arange(nv)[:, None]

  def _compact(M):  # (…, nv, nv) -> (…, nv, depth)
    return M[..., rows, s.anc_clip] * jnp.asarray(s.mask, M.dtype)

  def _kernel_ok() -> bool:
    if not _ldl_enabled(s.nv):
      return False
    c = ldl_mod.consts_for(s)
    return c.vmem_bytes(4) < 10 * 2**20

  @jax.custom_batching.custom_vmap
  def factor_cv(M):
    return sparse.factor(s, M)

  @factor_cv.def_vmap
  def _factor_vmap(axis_size, in_batched, M):
    if in_batched[0] and M.ndim == 3 and _kernel_ok():
      return ldl_mod.ldl_factor(ldl_mod.consts_for(s), _compact(M)), True
    if not in_batched[0]:
      M = jnp.broadcast_to(M, (axis_size,) + M.shape)
    return jax.vmap(lambda a: sparse.factor(s, a))(M), True

  @jax.custom_batching.custom_vmap
  def solve_cv(S, b):
    return sparse.solve(s, S, b)

  @solve_cv.def_vmap
  def _solve_vmap(axis_size, in_batched, S, b):
    sb, bb = in_batched
    if sb and bb and S.ndim == 3 and b.ndim == 2 and _kernel_ok():
      return ldl_mod.ldl_solve(ldl_mod.consts_for(s), S, b), True
    if not sb:
      S = jnp.broadcast_to(S, (axis_size,) + S.shape)
    if not bb:
      b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    return jax.vmap(lambda f, r: sparse.solve(s, f, r))(S, b), True

  @jax.custom_batching.custom_vmap
  def factor_solve_cv(M, b):
    return sparse.solve(s, sparse.factor(s, M), b)

  @factor_solve_cv.def_vmap
  def _factor_solve_vmap(axis_size, in_batched, M, b):
    mb, bb = in_batched
    if mb and bb and M.ndim == 3 and b.ndim == 2 and _kernel_ok():
      return ldl_mod.ldl_factor_solve(
          ldl_mod.consts_for(s), _compact(M), b), True
    if not mb:
      M = jnp.broadcast_to(M, (axis_size,) + M.shape)
    if not bb:
      b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    return jax.vmap(
        lambda a, r: sparse.solve(s, sparse.factor(s, a), r))(M, b), True

  return factor_cv, solve_cv, factor_solve_cv


def ldl_factor(s, M: jax.Array) -> jax.Array:
  """Compact tree-sparse LDL factor of one env's (nv, nv) matrix; under
  vmap the whole batch runs in the Pallas kernel (ops/ldl.py)."""
  if get_diff_config() is not None:
    from mjtpu._src import sparse

    return sparse.factor(s, M)
  return _ldl_seams(*_structure_key(s))[0](M)


def ldl_solve(s, S: jax.Array, b: jax.Array) -> jax.Array:
  """Solve from the compact factor for one env; b must be (nv,) for the
  Pallas path (multi-rhs falls back to the jnp levelwise solve)."""
  if get_diff_config() is not None or b.ndim != 1:
    from mjtpu._src import sparse

    return sparse.solve(s, S, b)
  return _ldl_seams(*_structure_key(s))[1](S, b)


def ldl_factor_solve(s, M: jax.Array, b: jax.Array) -> jax.Array:
  """Fused factor+solve for one env (implicit integrators); batched
  dispatch shares a single VMEM residency for the factor and both
  substitution passes."""
  if get_diff_config() is not None or b.ndim != 1:
    from mjtpu._src import sparse

    return sparse.solve(s, sparse.factor(s, M), b)
  return _ldl_seams(*_structure_key(s))[2](M, b)
