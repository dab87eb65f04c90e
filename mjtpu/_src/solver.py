"""Constraint solver: CG (Polak-Ribière) and Newton over the primal cost.

Reference capability map: mujoco_torch/_src/solver.py (solve :244-553,
linesearch :378-497, frictionloss zones :328-343, warmstart :527-531).
The data-dependent iteration is a native ``lax.while_loop``; under
``jax.vmap`` JAX batches it with per-env masked convergence automatically —
the reference needed a patched while_loop vmap rule for this
(patches/_pr175526, deleted by design).

The primal problem (MuJoCo Computation docs): minimize over qacc
    0.5 (qacc - qacc_smooth)' M (qacc - qacc_smooth) + s(J qacc - aref)
where s() sums per-row penalties: quadratic for equality, huber-style for
frictionloss rows, one-sided quadratic for limits/contacts (pyramidal), and
cone-projected quadratic for elliptic contacts.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src import math, smooth, support
from mjtpu._src.diff_config import get_diff_config
from mjtpu._src.types import ConeType, Data, DisableBit, Model, SolverType
from mjtpu._src.precision import matmul_precision
from mjtpu.ops import fused


class _Context(NamedTuple):
  """Solver iterate.  The preconditioned gradient (Newton Hessian solve /
  CG M-solve) is NOT part of the state: it is computed at the START of each
  body iteration from (grad, quad, Jaref), so the expensive solve runs
  exactly `niter` times — the reference computes it for both warmstart
  candidates and again after the final accepted step (iterations+2 solves),
  all on states whose search direction is never used."""

  qacc: jax.Array       # (nv,)
  Ma: jax.Array         # (nv,) M @ qacc
  Jaref: jax.Array      # (nefc,) J @ qacc - aref
  efc_force: jax.Array  # (nefc,)
  cost: jax.Array       # ()
  grad: jax.Array       # (nv,)
  quad: jax.Array       # (nefc,) bool: row cost locally quadratic
  Mgrad: jax.Array      # (nv,) previous iteration's Mgrad (CG beta)
  search: jax.Array     # (nv,) previous iteration's search (CG beta)
  gMg: jax.Array        # () dot(prev grad, prev Mgrad) (CG beta denominator)
  gauss: jax.Array      # ()
  niter: jax.Array      # () int
  done: jax.Array       # () bool


class _EfcMeta(NamedTuple):
  """Static row-type structure (host)."""

  ne: int
  nf: int
  nl: int
  nefc: int
  # elliptic contacts grouped by condim (contacts are condim-sorted by the
  # driver): ((dim, row_starts, contact_ids), ...), all-int tuples.  Each
  # group is processed as ONE batched computation over its K contacts, so
  # trace and compile size stay flat in ncon (the reference unrolls a
  # python loop per contact instead, solver.py:133-157/193-218/272-289).
  elliptic_groups: tuple


def _efc_meta(m: Model) -> _EfcMeta:
  from mjtpu._src import collision_driver

  ne, nf, nl, nefc = support.count_constraints(m)
  by_dim: dict = {}
  if m.opt.cone == ConeType.ELLIPTIC:
    dims = collision_driver.make_condim(m)
    addr = collision_driver.contact_efc_address(m, ne, nf, nl)
    for c, (a, dim) in enumerate(zip(addr, dims)):
      if dim > 1:
        by_dim.setdefault(int(dim), []).append((int(a), c))
  groups = tuple(
      (dim, tuple(a for a, _ in lst), tuple(c for _, c in lst))
      for dim, lst in sorted(by_dim.items())
  )
  return _EfcMeta(ne, nf, nl, nefc, groups)


def _elliptic_geometry(U, D, mu0):
  """Shared elliptic-cone quantities, batched over K same-dim contacts.

  U, D: (K, dim); mu0: (K,).  Transforms the anisotropic friction cone to
  a circular cone in a D-weighted space: v_i = u_i sqrt(D_i/D_n),
  effective slope mu_t = mu_0 sqrt(D_n/D_t1) (= mu_0/sqrt(impratio) for
  standard params).  Returns (N, T, mu_t, v_scale, Dm) with
  Dm = D_n/(1 + mu_t^2); N/T/mu_t/Dm are (K,), v_scale is (K, dim-1)."""
  d_n = D[:, 0]
  v_scale = jnp.sqrt(D[:, 1:] / jnp.maximum(math.MINVAL, d_n)[:, None])
  v = U[:, 1:] * v_scale
  N = U[:, 0]
  T = jax.vmap(math.safe_norm)(v)
  mu_t = mu0 * jnp.sqrt(d_n / jnp.maximum(math.MINVAL, D[:, 1]))
  dm = d_n / (1.0 + mu_t * mu_t)
  return N, T, mu_t, v_scale, dm


def _group_rows(starts, dim):
  """(K, dim) static row-index array for one elliptic group."""
  return np.asarray(starts)[:, None] + np.arange(dim)[None, :]


def _mu_rows(meta: _EfcMeta, contact_friction, dtype):
  """(nefc,) per-row mu — contact friction[0] scattered to each elliptic
  block's normal row (one static scatter; zeros elsewhere)."""
  mu = jnp.zeros(meta.nefc, dtype=dtype)
  if meta.elliptic_groups:
    starts_all = np.concatenate(
        [np.asarray(s) for _, s, _ in meta.elliptic_groups])
    cids_all = np.concatenate(
        [np.asarray(c) for _, _, c in meta.elliptic_groups])
    mu = mu.at[starts_all].set(contact_friction[cids_all, 0])
  return mu


def _row_costs(m: Model, meta: _EfcMeta, Jaref, efc_D, efc_frictionloss, mu):
  """Per-row force / cost / quadratic-active mask given x = Jaref.

  Returns (force, cost_total, quad_active) where quad_active marks rows whose
  cost is locally quadratic (used for the Newton Hessian).
  """
  ne, nf = meta.ne, meta.nf
  nefc = meta.nefc
  dtype = Jaref.dtype

  row_idx = np.arange(nefc)
  is_eq = jnp.asarray(row_idx < ne)
  is_fric = jnp.asarray((row_idx >= ne) & (row_idx < ne + nf))
  is_ineq = jnp.asarray(row_idx >= ne + nf)

  # default: quadratic everywhere
  force = -efc_D * Jaref
  cost = 0.5 * efc_D * Jaref * Jaref
  quad = jnp.ones(nefc, dtype=bool)

  # frictionloss rows: linear zones beyond breakpoint R*f
  if nf:
    f = efc_frictionloss
    R = 1.0 / jnp.maximum(math.MINVAL, efc_D)
    lower = -R * f
    upper = R * f
    lin_neg = Jaref <= lower
    lin_pos = Jaref >= upper
    f_force = jnp.where(lin_neg, f, jnp.where(lin_pos, -f, -efc_D * Jaref))
    f_cost = jnp.where(
        lin_neg,
        -f * Jaref - 0.5 * R * f * f,
        jnp.where(lin_pos, f * Jaref - 0.5 * R * f * f, cost),
    )
    force = jnp.where(is_fric, f_force, force)
    cost = jnp.where(is_fric, f_cost, cost)
    quad = jnp.where(is_fric & (lin_neg | lin_pos), False, quad)

  # inequality rows: active only when x < 0
  active = Jaref < 0
  force = jnp.where(is_ineq & ~active, 0.0, force)
  cost = jnp.where(is_ineq & ~active, 0.0, cost)
  quad = jnp.where(is_ineq & ~active, False, quad)

  # elliptic cone groups override their rows (batched over each group's K)
  for dim, starts, _ in meta.elliptic_groups:
    idx = _group_rows(starts, dim)                      # (K, dim) static
    U = Jaref[idx]
    Db = efc_D[idx]
    N, T, mu_t, v_scale, dm = _elliptic_geometry(U, Db, mu[np.asarray(starts)])
    top = N >= mu_t * T                                 # (K,)
    bottom = (mu_t * N + T) <= 0
    nmt = N - mu_t * T
    mid_cost = 0.5 * dm * nmt * nmt
    # middle-zone force: fn = -dm*(N - mu*T); ft_i = (D_i/D_n) dm mu nmt u_i/T
    fn_mid = -dm * nmt
    tsafe = jnp.maximum(math.MINVAL, T)
    ft_mid = (
        (Db[:, 1:] / Db[:, :1]) * dm[:, None] * mu_t[:, None] * nmt[:, None]
        * U[:, 1:] / tsafe[:, None]
    )
    f_mid = jnp.concatenate([fn_mid[:, None], ft_mid], axis=1)

    f_bottom = -Db * U
    c_bottom = 0.5 * jnp.sum(Db * U * U, axis=1)

    f_blk = jnp.where(
        top[:, None], 0.0, jnp.where(bottom[:, None], f_bottom, f_mid)
    )
    c_blk = jnp.where(top, 0.0, jnp.where(bottom, c_bottom, mid_cost))
    force = force.at[idx].set(f_blk)
    # zero the blocks' default cost contribution, add cone cost on row 0
    cost = cost.at[idx].set(jnp.zeros_like(f_blk))
    cost = cost.at[np.asarray(starts)].set(c_blk)
    quad = quad.at[idx].set(jnp.broadcast_to(bottom[:, None], idx.shape))

  return force, jnp.sum(cost), quad


class _LSPoint(NamedTuple):
  alpha: jax.Array  # ()
  cost: jax.Array   # ()
  d0: jax.Array     # () phi'(alpha)
  d1: jax.Array     # () phi''(alpha), floored positive


def _ls_point(meta, quad_gauss, quad, Jaref, jv, efc_D, efc_frictionloss, mu,
              alpha):
  """Evaluate (cost, phi', phi'') of the piecewise-quadratic total cost at
  alpha — MuJoCo C's LSPoint (reference solver.py:397-422): per-row
  quadratic coefficients masked by the active set at x = Jaref + alpha*jv,
  plus frictionloss linear zones and elliptic-cone zone corrections."""
  ne, nf = meta.ne, meta.nf
  nefc = meta.nefc
  x = Jaref + alpha * jv
  dtype = Jaref.dtype

  row_idx = np.arange(nefc)
  eq_fric = jnp.asarray(row_idx < ne + nf)
  active = (x < 0) | eq_fric

  adjust = jnp.zeros(3, dtype)
  if nf:
    is_fric = jnp.asarray((row_idx >= ne) & (row_idx < ne + nf))
    f = efc_frictionloss
    has_f = is_fric & (f > 0)
    R = 1.0 / jnp.maximum(math.MINVAL, efc_D)
    rf = R * f
    fl_ln = has_f & (x <= -rf)
    fl_lp = has_f & (x >= rf)
    qf0 = jnp.sum(jnp.where(fl_ln, f * (-0.5 * rf - Jaref), 0.0)) + jnp.sum(
        jnp.where(fl_lp, f * (-0.5 * rf + Jaref), 0.0)
    )
    qf1 = jnp.sum(jnp.where(fl_ln, -f * jv, 0.0)) + jnp.sum(
        jnp.where(fl_lp, f * jv, 0.0)
    )
    adjust = jnp.stack([qf0, qf1, jnp.zeros((), dtype)])
    active = active & ~fl_ln & ~fl_lp

  qt = quad_gauss + jnp.sum(
      jnp.where(active[:, None], quad, 0.0), axis=0
  ) + adjust
  cost = alpha * alpha * qt[2] + alpha * qt[1] + qt[0]
  d0 = 2.0 * alpha * qt[2] + qt[1]
  d1 = 2.0 * qt[2]

  # elliptic groups: replace their rows' one-sided-quadratic contribution
  # with the cone zones (batched over each group's K contacts)
  for dim, starts, _ in meta.elliptic_groups:
    idx = _group_rows(starts, dim)                      # (K, dim) static
    X = x[idx]
    JV = jv[idx]
    Db = efc_D[idx]
    XA = Jaref[idx]
    N, T, mu_t, v_scale, dm = _elliptic_geometry(X, Db, mu[np.asarray(starts)])
    jn, ju = JV[:, 0], JV[:, 1:] * v_scale
    v = X[:, 1:] * v_scale
    top = N >= mu_t * T
    bottom = (mu_t * N + T) <= 0
    # remove default (one-sided quadratic) contribution of these rows
    blk_active = X < 0
    cost = cost - jnp.sum(jnp.where(blk_active, 0.5 * Db * X * X, 0.0))
    d0 = d0 - jnp.sum(jnp.where(blk_active, Db * X * JV, 0.0))
    d1 = d1 - jnp.sum(jnp.where(blk_active, Db * JV * JV, 0.0))
    del XA
    # bottom: full quadratic over the block
    c_bot = 0.5 * jnp.sum(Db * X * X, axis=1)
    d_bot = jnp.sum(Db * X * JV, axis=1)
    dd_bot = jnp.sum(Db * JV * JV, axis=1)
    # middle: cone cost 0.5*dm*(N - mu T)^2
    tsafe = jnp.maximum(math.MINVAL, T)
    dt = jnp.sum(v * ju, axis=1) / tsafe
    ddt = (jnp.sum(ju * ju, axis=1) - dt * dt) / tsafe
    nmt = N - mu_t * T
    dnmt = jn - mu_t * dt
    c_mid = 0.5 * dm * nmt * nmt
    d_mid = dm * nmt * dnmt
    dd_mid = dm * (dnmt * dnmt + nmt * (-mu_t) * ddt)
    cost = cost + jnp.sum(jnp.where(top, 0.0, jnp.where(bottom, c_bot, c_mid)))
    d0 = d0 + jnp.sum(jnp.where(top, 0.0, jnp.where(bottom, d_bot, d_mid)))
    d1 = d1 + jnp.sum(jnp.where(top, 0.0, jnp.where(bottom, dd_bot, dd_mid)))

  # Guard degenerate d1 (zero/noise-scale search direction: converged or
  # frozen lanes) with a WHERE over the whole |d1| < MINVAL band, not the
  # reference's additive `d1 + (d1==0)*MINVAL`.  Two AD hazards with the
  # additive form: (a) it keeps d(d1_guarded)/d(d1) = 1, so the backward of
  # the Newton candidate `alpha - d0/d1` multiplies cotangents by ~1/d1 on
  # every degenerate lane, compounding across rollout steps into overflow;
  # (b) a search direction of magnitude eps gives d1 ~ eps^2, whose square
  # in the same backward (-d0/d1^2) underflows to 0 -> inf, and the masked
  # lanes' `0 * inf = NaN` then poisons the whole gradient.  The where
  # routes ZERO cotangent to all guarded lanes and bounds 1/d1 at 1/MINVAL;
  # forward values only change where the candidate was rejected garbage
  # (|phi''| < 1e-15 at meaninertia scale is never a physical bracket).
  d1 = jnp.where(jnp.abs(d1) < math.MINVAL, math.MINVAL, d1)
  return _LSPoint(alpha=alpha, cost=cost, d0=d0, d1=d1)


def _rescale(m: Model, value):
  return value / (m.stat.meaninertia * max(1, m.nv))


@matmul_precision
def solve(m: Model, d: Data, fixed_iterations: bool = False) -> Data:
  """Solves for constrained qacc (mj_fwdConstraint via CG/Newton)."""
  meta = _efc_meta(m)
  dtype = d.qpos.dtype
  nefc = meta.nefc

  efc_J = d.efc_J
  efc_D = d.efc_D
  efc_aref = d.efc_aref
  efc_frictionloss = d.efc_frictionloss
  qfrc_smooth = d.qfrc_smooth
  qacc_smooth = d.qacc_smooth

  # per-row mu (contact friction[0]) for elliptic cones
  mu_rows = _mu_rows(meta, d.contact.friction, dtype)

  newton = m.opt.solver == SolverType.NEWTON

  def update_constraint(qacc, Ma, Jaref):
    force, cost_c, quad = _row_costs(
        m, meta, Jaref, efc_D, efc_frictionloss, mu_rows
    )
    gauss = 0.5 * jnp.dot(Ma - qfrc_smooth, qacc - qacc_smooth)
    return force, gauss + cost_c, gauss, quad

  def gradient(Ma, force):
    g = Ma - qfrc_smooth
    return g - efc_J.T @ force if nefc else g

  # Forest-blocked Newton (big multi-tree scenes): solve H mgrad = grad
  # matrix-free with PCG preconditioned by H's per-tree diagonal blocks
  # instead of materializing and densely factoring the (nv, nv) Hessian —
  # O(iters · (nefc·nv + Σ bs²)) instead of O(nv³) per Newton step
  # (SURVEY.md §7 hard-part #1).  OFF by default: although it wins the FLOP
  # count, its ~32 sequential PCG while_loop iterations are small
  # latency-bound matvec regions, while the dense path is two MXU matmuls +
  # the Pallas fused Cholesky — measured on TPU v5e, dense runs settled
  # scene_pile (nv=192, B=512) at ~1.3M steps/s vs blockpcg's tens of ms per
  # dispatch (round-3 numbers claiming the reverse were contaminated by the
  # fetch-degradation artifact; see scripts/ab_newton_r4.py).  Opt in with
  # MJTPU_NEWTON_PCG=1 for memory-bound cases where (nv, nv) per env does
  # not fit.  Trace-time gate: multi-tree block structure, nv past the dense
  # crossover, and not a differentiated trace (the PCG while_loop has no
  # reverse rule).
  _blocks = smooth.mass_blocks(m) if newton else None
  use_pcg = (
      _blocks is not None
      and m.nv >= int(os.environ.get("MJTPU_NEWTON_PCG_MIN_NV", "64"))
      and os.environ.get("MJTPU_NEWTON_PCG", "0") == "1"
      and get_diff_config() is None
  )

  def _cone_blocks(Jaref):
    """Exact cone Hessian for middle-zone elliptic blocks:
      H = Dm a a' - (Dm nmt mu / T) S (I - vv') S,  a = (1, -mu S v_hat)
    batched per condim group: [(hcone (K,dim,dim), Jblk (K,dim,nv)), ...]."""
    out = []
    for dim, starts, _ in meta.elliptic_groups:
      idx = _group_rows(starts, dim)                  # (K, dim) static
      K = idx.shape[0]
      U = Jaref[idx]
      Db = efc_D[idx]
      Jblk = efc_J[idx]                               # (K, dim, nv)
      N, T, mu_t, v_scale, dm = _elliptic_geometry(
          U, Db, mu_rows[np.asarray(starts)])
      middle = (N < mu_t * T) & ((mu_t * N + T) > 0)
      tsafe = jnp.maximum(math.MINVAL, T)
      v_hat = U[:, 1:] * v_scale / tsafe[:, None]
      a = jnp.concatenate(
          [jnp.ones((K, 1), dtype), -mu_t[:, None] * v_scale * v_hat],
          axis=1,
      )
      hcone = dm[:, None, None] * a[:, :, None] * a[:, None, :]
      nmt = N - mu_t * T
      curv = -(dm * nmt * mu_t / tsafe)
      pmat = (
          jnp.eye(dim - 1, dtype=dtype)[None]
          - v_hat[:, :, None] * v_hat[:, None, :]
      )
      hcone = hcone.at[:, 1:, 1:].add(
          curv[:, None, None]
          * (v_scale[:, :, None] * pmat * v_scale[:, None, :])
      )
      hcone = jnp.where(middle[:, None, None], hcone, jnp.zeros_like(hcone))
      out.append((hcone, Jblk))
    return out

  # f32: regularize the Hessian so near-singular active sets stay
  # factorable (preconditioner only — the exact linesearch still
  # minimizes the true cost, so converged solutions are unchanged)
  _use_reg = dtype != jnp.float64
  _reg = 1e-6 * m.stat.meaninertia if _use_reg else jnp.zeros((), dtype)

  def _newton_pcg(grad, Dq, cones):
    """Preconditioned CG on H x = grad; H applied matrix-free, the
    preconditioner is H's per-tree diagonal blocks (qM block + that
    block's own J'DJ restriction + reg), cholesky'd batched per size
    group — contact coupling *between* trees is what PCG iterates on."""
    pre, mblk = [], []
    for bs, rows, ii, jj in smooth._block_indices(_blocks):
      Jb = efc_J[:, rows]  # (nefc, k, bs)
      Mb = d.qM[ii, jj]    # (k, bs, bs) — the blocks tile [0, nv)
      mblk.append((rows, Mb))
      hb = jnp.einsum("nkb,n,nkc->kbc", Jb, Dq, Jb) + Mb
      if _use_reg:
        hb = hb + _reg * jnp.eye(bs, dtype=dtype)[None]
      pre.append((rows, jax.vmap(math.safe_cholesky)(hb)))

    def pinv(r):
      out = jnp.zeros_like(r)
      for rows, fb in pre:
        out = out.at[rows].set(math.cho_solve(fb, r[rows]))
      return out

    def hmul(x):
      # block-diagonal M @ x (qM has no cross-tree entries)
      hx = jnp.zeros_like(x)
      for rows, Mb in mblk:
        hx = hx.at[rows].set(jnp.einsum("kbc,kc->kb", Mb, x[rows]))
      if _use_reg:
        hx = hx + _reg * x
      if nefc:
        hx = hx + efc_J.T @ (Dq * (efc_J @ x))
      for hcone, jblk in cones:
        jx = jnp.einsum("kiv,v->ki", jblk, x)
        hx = hx + jnp.einsum("kiv,ki->v", jblk,
                             jnp.einsum("kij,kj->ki", hcone, jx))
      return hx

    gnorm = math.safe_norm(grad)
    rtol = 1e-10 if dtype == jnp.float64 else 1e-6
    tol2 = (rtol * gnorm) ** 2 + math.MINVAL
    maxiter = int(os.environ.get("MJTPU_NEWTON_PCG_MAXITER", "32"))

    z0 = pinv(grad)
    state = (jnp.zeros_like(grad), grad, z0, z0,
             jnp.dot(grad, z0), jnp.zeros((), jnp.int32))

    def cond(s):
      _, r, _, _, _, k = s
      return (jnp.dot(r, r) > tol2) & (k < maxiter)

    def body(s):
      x, r, z, p, rz, k = s
      hp = hmul(p)
      alpha = rz / jnp.maximum(math.MINVAL, jnp.dot(p, hp))
      x = x + alpha * p
      r = r - alpha * hp
      z = pinv(r)
      rz_new = jnp.dot(r, z)
      beta = rz_new / jnp.maximum(math.MINVAL, rz)
      return x, r, z, z + beta * p, rz_new, k + 1

    x, *_ = jax.lax.while_loop(cond, body, state)
    return x

  def precond_grad(grad, quad, Jaref):
    if not newton:
      return smooth.solve_m(m, d, grad)
    Dq = efc_D * quad
    cones = _cone_blocks(Jaref)
    if use_pcg:
      return _newton_pcg(grad, Dq, cones)
    h = d.qM + (efc_J.T * Dq) @ efc_J
    if _use_reg:
      h = h + _reg * jnp.eye(m.nv, dtype=dtype)
    # fold all K cone congruences J'HJ into h (one pair of MXU matmuls
    # per condim group)
    for hcone, jblk in cones:
      hj = jnp.einsum("kij,kjv->kiv", hcone, jblk)
      h = h + jnp.einsum("kiv,kiw->vw", jblk, hj)
    return fused.chol_solve(h, grad)

  def linesearch(qacc, Ma, Jaref, search, gauss):
    """MuJoCo C's exact 3-point lo/hi bracket-swap linesearch (matches the
    reference solver.py:378-497 / MJX), so iterate paths — and therefore
    trajectories under truncated-iteration benchmark configs like the
    standard humanoid's iterations=1/ls_iterations=4 — are identical to C,
    not merely the converged solutions."""
    mv = d.qM @ search
    jv = efc_J @ search

    smag = math.safe_norm(search) * m.stat.meaninertia * max(1, m.nv)
    gtol = m.opt.tolerance * m.opt.ls_tolerance * smag

    quad_gauss = jnp.stack([
        gauss,
        jnp.dot(search, Ma - qfrc_smooth),
        0.5 * jnp.dot(search, mv),
    ])
    quad = (
        jnp.stack([0.5 * Jaref * Jaref, jv * Jaref, 0.5 * jv * jv], axis=1)
        * efc_D[:, None]
    )  # (nefc, 3)

    point = lambda a: _ls_point(
        meta, quad_gauss, quad, Jaref, jv, efc_D, efc_frictionloss, mu_rows, a
    )

    p0 = point(jnp.zeros((), dtype))
    p1 = point(p0.alpha - p0.d0 / p0.d1)
    # if the Newton step already meets gtol, skip the bracket search
    early = jnp.abs(p1.d0) < gtol
    swap01 = p1.d0 < p0.d0
    lo = jax.tree.map(lambda a, b: jnp.where(swap01, a, b), p1, p0)
    hi = jax.tree.map(lambda a, b: jnp.where(swap01, a, b), p0, p1)

    def ls_cond(carry):
      lo, hi, swap, i = carry
      done = i >= m.opt.ls_iterations
      done = done | ~swap
      done = done | ((lo.d0 < 0) & (lo.d0 > -gtol))
      done = done | ((hi.d0 > 0) & (hi.d0 < gtol))
      return ~done

    def ls_body(carry):
      lo, hi, _, i = carry
      lo_next = point(lo.alpha - lo.d0 / lo.d1)
      hi_next = point(hi.alpha - hi.d0 / hi.d1)
      mid = point(0.5 * (lo.alpha + hi.alpha))

      # accept a candidate if it narrows the bracket toward zero derivative,
      # or (when both endpoints have same-sign derivative: no bracket yet)
      # if it reduces |phi'| — C's one-sided Newton phase
      in_bracket = lambda cur, cand: ((cur < cand) & (cand < 0)) | (
          (cur > cand) & (cand > 0)
      )
      not_bracketed = (lo.d0 < 0) == (hi.d0 < 0)
      accept = lambda cur, cand: in_bracket(cur, cand) | (
          not_bracketed & (jnp.abs(cand) < jnp.abs(cur))
      )
      pick = lambda sw, cur, cand: jax.tree.map(
          lambda a, b: jnp.where(sw, b, a), cur, cand
      )

      s1 = accept(lo.d0, lo_next.d0)
      lo = pick(s1, lo, lo_next)
      s2 = accept(lo.d0, mid.d0)
      lo = pick(s2, lo, mid)
      s3 = accept(lo.d0, hi_next.d0)
      lo = pick(s3, lo, hi_next)
      s4 = accept(hi.d0, hi_next.d0)
      hi = pick(s4, hi, hi_next)
      s5 = accept(hi.d0, mid.d0)
      hi = pick(s5, hi, mid)
      s6 = accept(hi.d0, lo_next.d0)
      hi = pick(s6, hi, lo_next)
      swap = s1 | s2 | s3 | s4 | s5 | s6
      return lo, hi, swap, i + 1

    init = (lo, hi, ~early, jnp.zeros((), jnp.int32))
    if fixed_iterations:
      # diff / static-graph mode: while_loop has no transpose rule, so run
      # the bracket search as a fori_loop with converged lanes frozen
      def ls_masked(_, carry):
        new = ls_body(carry)
        cont = ls_cond(carry)
        return jax.tree.map(lambda a, b: jnp.where(cont, b, a), carry, new)

      lo, hi, _, _ = jax.lax.fori_loop(
          0, m.opt.ls_iterations, ls_masked, init
      )
    else:
      lo, hi, _, _ = jax.lax.while_loop(ls_cond, ls_body, init)

    # move only if improved; prefer the lower-cost endpoint
    improved = (lo.cost < p0.cost) | (hi.cost < p0.cost)
    alpha = jnp.where(lo.cost < hi.cost, lo.alpha, hi.alpha)
    alpha = jnp.where(improved, alpha, 0.0)
    return alpha, mv, jv

  def make_state(qacc):
    """(qacc, Ma, Jaref, force, cost, gauss, quad) — no gradient solve."""
    Ma = d.qM @ qacc
    Jaref = efc_J @ qacc - efc_aref if nefc else jnp.zeros(0, dtype)
    force, cost, gauss, quad = update_constraint(qacc, Ma, Jaref)
    return qacc, Ma, Jaref, force, cost, gauss, quad

  def make_ctx(state):
    qacc, Ma, Jaref, force, cost, gauss, quad = state
    return _Context(
        qacc=qacc,
        Ma=Ma,
        Jaref=Jaref,
        efc_force=force,
        cost=cost,
        grad=gradient(Ma, force),
        quad=quad,
        Mgrad=jnp.zeros(m.nv, dtype),
        search=jnp.zeros(m.nv, dtype),
        gMg=jnp.asarray(jnp.inf, dtype),  # beta = x/inf = 0 on iteration 0
        gauss=gauss,
        niter=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
    )

  # warmstart: take the better of qacc_warmstart and qacc_smooth.  Only
  # costs are compared, so neither candidate needs a gradient solve; the
  # single gradient of the winner is computed in make_ctx.
  if m.opt.disableflags & DisableBit.WARMSTART:
    ctx = make_ctx(make_state(qacc_smooth))
  else:
    st_w = make_state(d.qacc_warmstart)
    st_s = make_state(qacc_smooth)
    ctx = make_ctx(jax.tree.map(
        lambda a, b: jnp.where(st_w[4] < st_s[4], a, b), st_w, st_s
    ))

  def body(ctx: _Context) -> _Context:
    # the expensive preconditioned gradient (Newton: cone Hessian assembly +
    # Cholesky; CG: M-solve) runs HERE, once per accepted iteration
    mgrad = precond_grad(ctx.grad, ctx.quad, ctx.Jaref)
    if newton:
      search = -mgrad
    else:
      beta = jnp.dot(ctx.grad, mgrad - ctx.Mgrad) / jnp.maximum(
          math.MINVAL, ctx.gMg
      )
      beta = jnp.maximum(0.0, beta)
      search = -mgrad + beta * ctx.search
    gMg = jnp.dot(ctx.grad, mgrad)

    alpha, mv, jv = linesearch(ctx.qacc, ctx.Ma, ctx.Jaref, search, ctx.gauss)
    qacc = ctx.qacc + alpha * search
    Ma = ctx.Ma + alpha * mv
    Jaref = ctx.Jaref + alpha * jv
    force, cost, gauss, quad = update_constraint(qacc, Ma, Jaref)
    # reject non-improving steps (reference solver.py:489-497)
    worse = cost > ctx.cost
    qacc = jnp.where(worse, ctx.qacc, qacc)
    Ma = jnp.where(worse, ctx.Ma, Ma)
    Jaref = jnp.where(worse, ctx.Jaref, Jaref)
    force = jnp.where(worse, ctx.efc_force, force)
    cost = jnp.where(worse, ctx.cost, cost)
    quad = jnp.where(worse, ctx.quad, quad)
    grad = gradient(Ma, force)

    improvement = _rescale(m, ctx.cost - cost)
    gradnorm = _rescale(m, math.safe_norm(grad))
    done = ctx.done | (improvement < m.opt.tolerance) | (gradnorm < m.opt.tolerance)

    new = _Context(
        qacc=qacc,
        Ma=Ma,
        Jaref=Jaref,
        efc_force=force,
        cost=cost,
        grad=grad,
        quad=quad,
        Mgrad=mgrad,
        search=search,
        gMg=gMg,
        gauss=gauss,
        niter=ctx.niter + 1,
        done=done,
    )
    # freeze finished envs (also makes fixed_iterations exact)
    return jax.tree.map(
        lambda a, b: jnp.where(ctx.done, a, b), ctx, new
    )

  if fixed_iterations:
    ctx = jax.lax.fori_loop(0, m.opt.iterations, lambda _, c: body(c), ctx)
  else:
    ctx = jax.lax.while_loop(
        lambda c: (~c.done) & (c.niter < m.opt.iterations), body, ctx
    )

  qfrc_constraint = efc_J.T @ ctx.efc_force if nefc else jnp.zeros(m.nv, dtype)
  return d.replace(
      qacc=ctx.qacc,
      qacc_warmstart=ctx.qacc,
      qfrc_constraint=qfrc_constraint,
      efc_force=ctx.efc_force,
      solver_niter=ctx.niter,
  )
