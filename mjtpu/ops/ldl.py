"""Pallas TPU kernel: batched tree-sparse LDLᵀ factor + solve.

The BASELINE north-star names a Pallas batched *sparse* factorization for
factor_m/solve_m (reference keeps sparse LDL schedules, reference
smooth.py:311-354, device.py:763-829).  This kernel executes sparse.py's
levelwise zero-fill-in schedule (mj_factorM recast as static elimination
rounds) with the env batch riding the lane dimension:

  * the compact factor lives in VMEM as one (nv, TILE_B) tile per depth
    column — every entry of the factorization is a 128-wide lane vector;
  * the static tree schedule is baked as 0/1 *selection matrices*, so the
    per-round ancestor gathers and scatter-adds that XLA lowers to serial
    scatter chains become MXU matmuls (one gather matmul + one
    fold-all-shifts scatter matmul per elimination round).  All selection
    matrices ride in as TWO packed operands (a row-gather stack and a
    column-scatter stack) indexed by static slices;
  * factor and solve share one VMEM residency in the fused entry point
    (`ldl_factor_solve`), which backs the implicit-integrator
    `smooth.factor_solve` path.

Work per round is (nv × K·shifts × depth·TILE_B) MACs — more raw FLOPs
than the elementwise formulation, but it is MXU work on a machine whose
matmul units are otherwise idle during factorization, and it replaces
XLA's per-round gather/scatter chains.  Numerics match sparse.factor /
sparse.solve exactly: same round order, same MINVAL pivot floor, division
by D deferred to the end.

Seam: mjtpu/ops/fused.py `ldl_*` custom_vmap wrappers.  Knob
MJTPU_PALLAS_LDL = auto (default: engage on TPU for trees with
nv >= 40, where the measured win starts) | 1 (force) | 0 (off) — read at
TRACE time like MJTPU_PALLAS_CHOL.  Measured on TPU v5 lite, 66-dof
branchy tree, B=1024, full step(): 0.343 ms/step with the kernel vs
0.546 ms on the jnp levelwise path (1.59x).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mjtpu._src.sparse import Structure
from mjtpu._src.types import MINVAL

_TILE_B = 128


class _Pack:
  """Accumulates selection matrices into one packed operand, handing back
  static slice ranges."""

  def __init__(self, axis: int):
    self.axis = axis
    self.parts: list[np.ndarray] = []
    self.offset = 0

  def add(self, a: np.ndarray) -> tuple[int, int]:
    lo = self.offset
    self.offset += a.shape[self.axis]
    self.parts.append(a)
    return (lo, self.offset)

  def done(self, nv: int) -> np.ndarray:
    if not self.parts:
      return np.zeros((1, nv) if self.axis == 0 else (nv, 1))
    return np.concatenate(self.parts, axis=self.axis)


class _Consts:
  """Static schedule for one Structure as packed selection matrices.

  gmat (Rg, nv): vertical stack of every row-gather matrix (G = gmat[sl] @ S).
  smat (nv, Cs): horizontal stack of every scatter matrix (S += smat[:, sl] @ U).

  Phases:
    factor_rounds: (g_sl, ps, s_sl) — P gathers round rows; for each active
      shift p the update block scatters through one nv×K slab of s_sl.
    lt_rounds: (g_sl, cols, s_sl) — Lᵀ solve: per depth column c the
      contribution -L[k,c]·y[k] scatters into row anc[k, c].
    l_rounds: (g_sl, cols, a_sl, pt_sl) — L solve: per column c gather
      x[anc[k, c]] (a_sl slab), accumulate, scatter -acc into rows ks.
  """

  def __init__(self, s: Structure):
    nv, D = s.nv, s.depth
    self.nv, self.depth = nv, D
    g, sc = _Pack(0), _Pack(1)

    def one_hot_rows(idx: np.ndarray, valid=None) -> np.ndarray:
      """(len(idx), nv) one-hot; invalid rows all-zero."""
      a = np.zeros((len(idx), nv))
      sel = np.arange(len(idx)) if valid is None else np.nonzero(valid)[0]
      a[sel, idx[sel if valid is None else valid]] = 1.0
      return a

    self.factor_rounds = []
    for r in s.rounds:
      ks = r.ks
      if len(ks) == 0:
        continue
      K = len(ks)
      ps, slabs = [], []
      for p in range(1, D):
        tgt = s.anc[ks, D - 1 - p]
        valid = tgt < nv
        if not valid.any():
          continue
        ps.append(p)
        slabs.append(one_hot_rows(tgt, valid).T)  # (nv, K)
      if not ps:
        continue
      g_sl = g.add(one_hot_rows(ks))
      s_sl = sc.add(np.concatenate(slabs, axis=1))  # (nv, K·|ps|)
      self.factor_rounds.append((g_sl, tuple(ps), s_sl, K))

    self.lt_rounds = []
    for ks in s.height_rounds:
      K = len(ks)
      cols, slabs = [], []
      for c in range(D - 1):
        tgt = s.anc[ks, c]
        valid = tgt < nv
        if not valid.any():
          continue
        cols.append(c)
        slabs.append(one_hot_rows(tgt, valid).T)
      if not cols:
        continue
      g_sl = g.add(one_hot_rows(ks))
      s_sl = sc.add(np.concatenate(slabs, axis=1))
      self.lt_rounds.append((g_sl, tuple(cols), s_sl, K))

    self.l_rounds = []
    for ks in s.depth_rounds:
      K = len(ks)
      cols, slabs = [], []
      for c in range(D - 1):
        src = s.anc[ks, c]
        valid = src < nv
        if not valid.any():
          continue
        cols.append(c)
        slabs.append(one_hot_rows(src, valid))  # (K, nv) gather
      if not cols:
        continue
      P = one_hot_rows(ks)
      g_sl = g.add(P)
      a_sl = g.add(np.concatenate(slabs, axis=0))  # (K·|cols|, nv)
      pt_sl = sc.add(P.T)
      self.l_rounds.append((g_sl, tuple(cols), a_sl, pt_sl, K))

    self.gmat = g.done(nv)
    self.smat = sc.done(nv)

  def vmem_bytes(self, dtype_bytes: int = 4) -> int:
    """Rough working-set bound for the seam's fits-in-VMEM gate."""
    tiles = 3 * self.nv * self.depth * _TILE_B
    worst_stack = max(
        [K * len(ps) * self.depth * _TILE_B
         for _, ps, _, K in self.factor_rounds] + [0])
    packed = self.gmat.size + self.smat.size
    return (tiles + worst_stack + packed) * dtype_bytes


@functools.lru_cache(maxsize=32)
def _consts_cached(nv: int, parentid: tuple[int, ...]) -> _Consts:
  from mjtpu._src import sparse

  return _Consts(sparse._build(nv, parentid))


def consts_for(s: Structure) -> _Consts:
  # anc row i = [pad..., root, ..., parent, i]: parent sits at column D-2
  parentid = tuple(
      int(s.anc[i, s.depth - 2]) if s.anc[i, s.depth - 2] < s.nv else -1
      for i in range(s.nv)
  )
  return _consts_cached(s.nv, parentid)


# -----------------------------------------------------------------------------
# kernel bodies: operate on lane-blocked values (depth column d = lanes
# [d·TILE_B, (d+1)·TILE_B) of a (nv, depth·TILE_B) working value)
# -----------------------------------------------------------------------------


def _blk(x, d):
  return x[:, d * _TILE_B:(d + 1) * _TILE_B]


def _dot(a, b):
  return jax.lax.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=b.dtype)


def _gsl(G, sl):
  return G[sl[0]:sl[1], :]


def _ssl(S, sl):
  return S[:, sl[0]:sl[1]]


def _factor_value(c: _Consts, gmat, smat, S):
  """Runs all elimination rounds on the working value S (nv, depth·TB)."""
  D = c.depth
  minval = jnp.asarray(MINVAL, S.dtype)
  for g_sl, ps, s_sl, _ in c.factor_rounds:
    G = _dot(_gsl(gmat, g_sl), S)                          # (K, D·TB)
    inv = 1.0 / jnp.maximum(_blk(G, D - 1), minval)        # (K, TB)
    pieces = []
    for p in ps:
      cp = _blk(G, D - 1 - p) * inv                        # (K, TB)
      zeros = jnp.zeros((G.shape[0], p * _TILE_B), S.dtype)
      shifted = jnp.concatenate([zeros, G[:, :(D - p) * _TILE_B]], axis=1)
      cp_w = jnp.concatenate([cp] * D, axis=1)             # (K, D·TB)
      pieces.append(-cp_w * shifted)
    stack = jnp.concatenate(pieces, axis=0)                # (K·|ps|, D·TB)
    S = S + _dot(_ssl(smat, s_sl), stack)
  d = jnp.maximum(_blk(S, D - 1), minval)                  # (nv, TB)
  if D == 1:
    return d
  d_w = jnp.concatenate([d] * (D - 1), axis=1)
  return jnp.concatenate([S[:, :(D - 1) * _TILE_B] / d_w, d], axis=1)


def _solve_value(c: _Consts, gmat, smat, S, b):
  """Solves M x = b from the finished compact factor S; b is (nv, TB)."""
  D = c.depth
  minval = jnp.asarray(MINVAL, S.dtype)
  x = b
  # Lᵀ y = b: finalized y[k] pushes -L[k,c]·y[k] into its ancestor rows
  for g_sl, cols, s_sl, K in c.lt_rounds:
    P = _gsl(gmat, g_sl)
    xk = _dot(P, x)                                        # (K, TB)
    Lg = _dot(P, S)                                        # (K, D·TB)
    stack = jnp.concatenate([-_blk(Lg, col) * xk for col in cols], axis=0)
    x = x + _dot(_ssl(smat, s_sl), stack)                  # (nv, TB)
  # diagonal
  x = x / jnp.maximum(_blk(S, D - 1), minval)
  # L x = y: x[k] -= Σ_c L[k,c] · x[ancestor at column c]
  for g_sl, cols, a_sl, pt_sl, K in c.l_rounds:
    P = _gsl(gmat, g_sl)
    Lg = _dot(P, S)                                        # (K, D·TB)
    xa = _dot(_gsl(gmat, a_sl), x)                         # (K·|cols|, TB)
    lstack = jnp.concatenate([_blk(Lg, col) for col in cols], axis=0)
    prod = (lstack * xa).reshape(len(cols), K, _TILE_B)
    acc = jnp.sum(prod, axis=0)                            # (K, TB)
    x = x - _dot(_ssl(smat, pt_sl), acc)
  return x


# -----------------------------------------------------------------------------
# pallas_call wrappers (batched: compact layout (B, nv, depth) outside)
# -----------------------------------------------------------------------------


def _to_wide(ref):
  """(nv, depth, TB) ref -> (nv, depth·TB) value, depth columns lane-blocked."""
  depth = ref.shape[1]
  return jnp.concatenate([ref[:, d, :] for d in range(depth)], axis=1)


def _store_wide(ref, S):
  depth = ref.shape[1]
  for d in range(depth):
    ref[:, d, :] = _blk(S, d)


def _pad_batch(x, b):
  pad = (-b) % _TILE_B
  if pad:
    x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
  return x


def _specs(nv, depth):
  spec3 = pl.BlockSpec((nv, depth, _TILE_B), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM)
  spec2 = pl.BlockSpec((nv, _TILE_B), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
  full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                memory_space=pltpu.VMEM)
  return spec3, spec2, full


def _packed(c: _Consts, dtype):
  return jnp.asarray(c.gmat, dtype), jnp.asarray(c.smat, dtype)


def ldl_factor(c: _Consts, Mc: jax.Array) -> jax.Array:
  """Batched compact factor: Mc (B, nv, depth) -> S (B, nv, depth)."""
  b, nv, depth = Mc.shape
  Mc = _pad_batch(Mc, b)
  mt = jnp.transpose(Mc, (1, 2, 0))  # (nv, depth, B)
  gmat, smat = _packed(c, Mc.dtype)

  def kernel(m_ref, g_ref, s_ref, out_ref):
    _store_wide(out_ref,
                _factor_value(c, g_ref[:], s_ref[:], _to_wide(m_ref)))

  spec3, _, full = _specs(nv, depth)
  st = pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct(mt.shape, Mc.dtype),
      grid=(mt.shape[2] // _TILE_B,),
      in_specs=[spec3, full(gmat), full(smat)],
      out_specs=spec3,
  )(mt, gmat, smat)
  return jnp.transpose(st, (2, 0, 1))[:b]


def ldl_solve(c: _Consts, S: jax.Array, rhs: jax.Array) -> jax.Array:
  """Batched solve from the compact factor: S (B, nv, depth), rhs (B, nv)."""
  b, nv, depth = S.shape
  S = _pad_batch(S, b)
  rhs = _pad_batch(rhs, b)
  st = jnp.transpose(S, (1, 2, 0))
  bt = jnp.transpose(rhs, (1, 0))
  gmat, smat = _packed(c, S.dtype)

  def kernel(s_ref, b_ref, g_ref, sc_ref, x_ref):
    x_ref[:] = _solve_value(c, g_ref[:], sc_ref[:], _to_wide(s_ref), b_ref[:])

  spec3, spec2, full = _specs(nv, depth)
  xt = pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct(bt.shape, S.dtype),
      grid=(bt.shape[1] // _TILE_B,),
      in_specs=[spec3, spec2, full(gmat), full(smat)],
      out_specs=spec2,
  )(st, bt, gmat, smat)
  return jnp.transpose(xt, (1, 0))[:b]


def ldl_factor_solve(c: _Consts, Mc: jax.Array, rhs: jax.Array) -> jax.Array:
  """Fused factor + solve in one VMEM residency: Mc (B, nv, depth),
  rhs (B, nv) -> x (B, nv).  Backs smooth.factor_solve's sparse path
  (implicit-damping integrators)."""
  b, nv, depth = Mc.shape
  Mc = _pad_batch(Mc, b)
  rhs = _pad_batch(rhs, b)
  mt = jnp.transpose(Mc, (1, 2, 0))
  bt = jnp.transpose(rhs, (1, 0))
  gmat, smat = _packed(c, Mc.dtype)

  def kernel(m_ref, b_ref, g_ref, sc_ref, x_ref):
    g, sc = g_ref[:], sc_ref[:]
    S = _factor_value(c, g, sc, _to_wide(m_ref))
    x_ref[:] = _solve_value(c, g, sc, S, b_ref[:])

  spec3, spec2, full = _specs(nv, depth)
  xt = pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct(bt.shape, Mc.dtype),
      grid=(bt.shape[1] // _TILE_B,),
      in_specs=[spec3, spec2, full(gmat), full(smat)],
      out_specs=spec2,
  )(mt, bt, gmat, smat)
  return jnp.transpose(xt, (1, 0))[:b]
