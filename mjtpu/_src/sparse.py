"""Tree-structured sparse LDLᵀ factorization of the mass matrix.

MuJoCo's qM has the kinematic-chain sparsity pattern: M[i, j] ≠ 0 only when
one of i, j is an ancestor dof of the other.  Eliminating dofs leaves-first
(descending dof index respects this: parents come before children) produces
ZERO fill-in, so the factor M = Lᵀ D L lives on exactly the same pattern —
this is mj_factorM / mj_solveLD (reference capability: mujoco_torch keeps
sparse LDL schedules, reference smooth.py:311-354, device.py:763-829).

TPU-native formulation: no per-entry loops and no dynamic control flow.
The tree is compiled into a static *levelwise schedule* at trace time:

  * rows are stored right-aligned in a compact (nv, maxdepth) buffer —
    column maxdepth-1 is the diagonal, column maxdepth-1-p the ancestor at
    distance p up the chain;
  * **factor**: one round per dof-tree *height* level.  A round eliminates
    every dof at that height with a single flat gather → multiply →
    scatter-add (all indices are static numpy, built once per model);
    updates from different dofs in a round are additive and never touch a
    row eliminated in the same round (a proper ancestor is strictly
    higher), so rounds parallelize over the batch AND over same-level dofs;
  * **solve**: forward substitution runs one round per *depth* level
    (ancestors first), backward substitution one round per height level
    (descendants first) — span 2·maxdepth instead of the dense triangular
    solve's nv.

Work is Σₖ depth(k)² — MuJoCo's sparse flop count — versus the dense
Cholesky's nv³/3.  For a serial chain the two coincide (every dof is an
ancestor of all later ones; the pattern is fully dense), so the AUTO gate
keeps chains on the dense MXU path and engages only when the tree is
branchy enough to pay: `flops_sparse < _AUTO_RATIO · flops_dense`.

Knob: MJTPU_SPARSE_LDL = auto (default) | 1 (force on) | 0 (off) — read at
TRACE time like MJTPU_MASS_BLOCKS; flipping it after a jit has no effect.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src.types import MINVAL, Model

_AUTO_RATIO = 0.5
# below ~32 dofs the batched dense Cholesky (one fused MXU kernel, batch in
# lanes) beats the levelwise rounds even when the flop count says otherwise:
# humanoid (nv=23, branchy, passes the flop ratio) measured 7.2-7.5M
# env-steps/s sparse vs 8.5-10.5M dense at B=4096 in back-to-back A/B/B/A
# on a v5e; the nv=66 branchy tree stays 1.88x in favor of sparse
_AUTO_MIN_NV = 32


class _Round(NamedTuple):
  """One elimination round: dofs `ks` plus flat update indices.

  For each eliminated dof k and ancestor pair (i at distance p, j at
  distance q ≥ p): M[i, j] -= M[k, i]·M[k, j] / D[k].  `u_k` indexes into
  the round's gathered rows; `u_si`/`u_sj` are source columns in the
  compact layout; `u_ti`/`u_tc` the target (row, column)."""

  ks: np.ndarray
  u_k: np.ndarray
  u_si: np.ndarray
  u_sj: np.ndarray
  u_ti: np.ndarray
  u_tc: np.ndarray


class Structure(NamedTuple):
  """Static levelwise schedule for one dof tree (all numpy, hashable id)."""

  nv: int
  depth: int                      # maxdepth = compact row width
  anc: np.ndarray                 # (nv, depth) right-aligned, pad = nv
  anc_clip: np.ndarray            # gather-safe: pad clipped to 0
  mask: np.ndarray                # (nv, depth) 1.0 where a real ancestor
  rounds: tuple[_Round, ...]      # elimination, by height ascending
  depth_rounds: tuple[np.ndarray, ...]   # forward solve, by depth ascending
  height_rounds: tuple[np.ndarray, ...]  # backward solve, by height ascending
  flops_sparse: int
  flops_dense: int


@functools.lru_cache(maxsize=64)
def _build(nv: int, parentid: tuple[int, ...]) -> Structure:
  chains = []
  for i in range(nv):
    c, j = [], i
    while j >= 0:
      c.append(j)
      j = parentid[j]
    chains.append(c[::-1])  # root .. self
  depths = np.array([len(c) for c in chains])
  D = int(depths.max())

  anc = np.full((nv, D), nv, dtype=np.int32)
  for i, c in enumerate(chains):
    anc[i, D - len(c):] = c
  mask = (anc < nv).astype(np.float64)
  anc_clip = np.minimum(anc, nv - 1)

  # height (longest path to a leaf) in the dof tree
  height = np.zeros(nv, dtype=np.int64)
  for i in range(nv - 1, -1, -1):
    p = parentid[i]
    if p >= 0:
      height[p] = max(height[p], height[i] + 1)

  rounds = []
  for h in range(int(height.max()) + 1):
    ks = np.nonzero(height == h)[0].astype(np.int32)
    u_k, u_si, u_sj, u_ti, u_tc = [], [], [], [], []
    for local, k in enumerate(ks):
      dk = int(depths[k])
      for p in range(1, dk):
        i = anc[k, D - 1 - p]
        for q in range(p, dk):
          u_k.append(local)
          u_si.append(D - 1 - p)
          u_sj.append(D - 1 - q)
          u_ti.append(i)
          u_tc.append(D - 1 - (q - p))
    rounds.append(
        _Round(
            ks,
            np.asarray(u_k, dtype=np.int32),
            np.asarray(u_si, dtype=np.int32),
            np.asarray(u_sj, dtype=np.int32),
            np.asarray(u_ti, dtype=np.int32),
            np.asarray(u_tc, dtype=np.int32),
        )
    )

  depth_rounds = tuple(
      np.nonzero(depths - 1 == t)[0].astype(np.int32)
      for t in range(1, D)
      if np.any(depths - 1 == t)
  )
  height_rounds = tuple(
      r.ks[depths[r.ks] > 1] for r in rounds if np.any(depths[r.ks] > 1)
  )

  flops_sparse = int(((depths - 1) * depths // 2).sum())
  flops_dense = nv**3 // 6
  return Structure(
      nv, D, anc, anc_clip, mask, tuple(rounds), depth_rounds,
      tuple(height_rounds), flops_sparse, flops_dense,
  )


def structure(m: Model) -> Structure | None:
  """The model's LDL schedule, or None when the dense path should run.

  Engages (knob permitting) only for single-block models — multi-tree
  scenes already factor per mass block (smooth.mass_blocks), which is the
  bigger win there — and only when the tree is branchy enough that the
  sparse flop count beats dense by `_AUTO_RATIO`."""
  knob = os.environ.get("MJTPU_SPARSE_LDL", "auto")
  if knob == "0" or m.nv == 0:
    return None
  from mjtpu._src import smooth

  if smooth.mass_blocks(m) is not None:
    return None
  s = _build(m.nv, tuple(int(x) for x in m.dof_parentid))
  if knob == "1":
    return s
  if m.nv < _AUTO_MIN_NV:
    return None
  return s if s.flops_sparse < _AUTO_RATIO * s.flops_dense else None


def factor(s: Structure, M: jax.Array) -> jax.Array:
  """Compact LDL factor (nv, depth) of a chain-pattern matrix M (nv, nv).

  Output: column depth-1 holds D (pivots, floored at MINVAL like
  mj_factorM); column depth-1-p holds L[k, ancestor-at-distance-p]
  (unit-lower L, M = Lᵀ D L)."""
  rows = jnp.arange(s.nv)[:, None]
  S = M[rows, s.anc_clip] * jnp.asarray(s.mask, dtype=M.dtype)
  for r in s.rounds:
    if not len(r.u_k):
      continue
    g = S[r.ks]                                   # (K, depth)
    dk = jnp.maximum(g[:, -1], MINVAL)
    vals = -(g[r.u_k, r.u_si] * g[r.u_k, r.u_sj]) / dk[r.u_k]
    S = S.at[r.u_ti, r.u_tc].add(vals)
  d = jnp.maximum(S[:, -1], MINVAL)
  S = jnp.concatenate([S[:, :-1] / d[:, None], d[:, None]], axis=1)
  return S


def solve(s: Structure, S: jax.Array, b: jax.Array) -> jax.Array:
  """Solves M x = b from the compact factor; b is (nv,) or (nv, k)."""
  vec = b.ndim == 1
  x = b[:, None] if vec else b
  Loff = S[:, :-1] * jnp.asarray(s.mask[:, :-1], dtype=S.dtype)

  # Lᵀ y = b: descendants first; finalized y[k] pushes into its ancestors
  for ks in s.height_rounds:
    contrib = -Loff[ks][:, :, None] * x[ks][:, None, :]   # (K, depth-1, k)
    x = x.at[s.anc[ks, :-1]].add(contrib, mode="drop")

  x = x / jnp.maximum(S[:, -1], MINVAL)[:, None]

  # L x = y: ancestors first; x[k] -= L[k, anc] · x[anc]
  for ks in s.depth_rounds:
    xa = x[s.anc_clip[ks, :-1]]                           # (K, depth-1, k)
    x = x.at[ks].add(-jnp.einsum("kd,kdj->kj", Loff[ks], xa))
  return x[:, 0] if vec else x


def scatter_dense(s: Structure, S: jax.Array) -> jax.Array:
  """Spreads the compact factor into Data's dense (nv, nv) qLD field (lower
  triangle = L off-diagonals, diagonal = D) so the Data schema is identical
  across factorization paths."""
  out = jnp.zeros((s.nv, s.nv), dtype=S.dtype)
  rows = jnp.broadcast_to(jnp.arange(s.nv)[:, None], s.anc.shape)
  return out.at[rows, s.anc].set(
      S * jnp.asarray(s.mask, dtype=S.dtype), mode="drop"
  )


def gather_compact(s: Structure, qLD: jax.Array) -> jax.Array:
  """Inverse of scatter_dense."""
  rows = jnp.arange(s.nv)[:, None]
  return qLD[rows, s.anc_clip] * jnp.asarray(s.mask, dtype=qLD.dtype)
