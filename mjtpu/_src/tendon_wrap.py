"""Spatial tendon wrap geometry (mju_wrap): sphere/cylinder, sidesite, inside.

Implements MuJoCo's exact `mju_wrap` contract, recovered from the C engine
(libmujoco 3.10, mju_wrap at .text+0x2dd8d0) and validated point-for-point
against the binary on 200k+ random configurations at float64 (gate decisions,
tangent-pair selection, wrap points to 1e-9, arc lengths to 1e-9; see
tests/test_tendon.py).  The reference (mujoco_torch) supports fixed tendons
only (reference smooth.py:470-497); this is capability-plus.

Everything is branchless jnp so it vmaps/jits cleanly; the only loop is the
fixed-trip Newton iteration of the inside-wrap solve.

Contract summary (2D circle at origin, radius r, endpoints e0/e1 outside):
- gate: wrap iff the clamped segment-to-center point `pnt` has |pnt| <= r, or
  a sidesite is given and dot(r*normalize(side2d), pnt) < 0.
- two closed-form tangent-point pairs; score = dot(normalize(t0+t1), side)
  with a sidesite else -|t0-t1|^2; a pair whose chords (e0,t0)x(e1,t1)
  mutually cross scores -10000; larger score wins (tie -> pair 2); if the
  winner's chords cross, no wrap.
- arc = acos(t0^.t1^), flipped to 2pi-acos by the pair-dependent cross sign.
- sidesite strictly inside the object switches to the inside-wrap solve:
  Newton on f(z) = acos(c01) + asin(z r/d0) + asin(z r/d1) - 2 asin(z) from
  z0 = 0.9999999 (<= 19 useful steps, tol 1e-6), touch point at the chosen
  endpoint direction rotated by asin(z) - asin(z r/d), wlen = 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MINVAL = 1e-15
# f(z0) constant: 2*asin(0.9999999) (the C engine bakes this literal).
_TWO_ASIN_Z0 = 3.1406982263915753
_Z0 = 0.9999999


def _norm(v, axis=-1):
  return jnp.sqrt(jnp.sum(v * v, axis=axis))


def _safe_div(a, b):
  return a / jnp.where(jnp.abs(b) < _MINVAL, jnp.where(b < 0, -_MINVAL, _MINVAL), b)


def _cross2(a, b):
  return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _segments_cross(e0, t0, e1, t1):
  """C's strict segment-intersection test between (e0,t0) and (e1,t1)."""
  d0 = t0 - e0
  d1 = t1 - e1
  det = _cross2(d0, d1)
  b = e1 - e0
  s = _safe_div(_cross2(b, d1), det)
  u = _safe_div(_cross2(b, d0), det)
  return (jnp.abs(det) > _MINVAL) & (s >= 0) & (s <= 1) & (u >= 0) & (u <= 1)


def wrap_circle2d(e0, e1, r, sd, has_side: bool):
  """2D circle wrap (C wrap_circle).  All args traced except has_side.

  e0, e1: (2,) endpoints; r: scalar radius; sd: (2,) sidesite direction
  point scaled to the circle (r * normalize(side2d)), ignored unless
  has_side.  Returns (wrapped, wlen, t0, t1); t0/t1 are garbage-safe zeros
  when not wrapped.
  """
  sqlen0 = e0 @ e0
  sqlen1 = e1 @ e1
  sqrad = r * r
  ok = (sqrad <= sqlen0) & (sqrad <= sqlen1) & (r >= _MINVAL)

  dif = e1 - e0
  dd = dif @ dif
  ok &= dd >= _MINVAL
  a = jnp.clip(_safe_div(-(e0 @ dif), dd), 0.0, 1.0)
  pnt = e0 + a * dif
  intersects = pnt @ pnt <= sqrad
  if has_side:
    forced = (sd @ pnt) < 0
    ok &= intersects | forced
  else:
    ok &= intersects

  sqrt0 = jnp.sqrt(jnp.maximum(sqlen0 - sqrad, 0.0))
  sqrt1 = jnp.sqrt(jnp.maximum(sqlen1 - sqrad, 0.0))
  den0 = jnp.maximum(sqlen0, _MINVAL)
  den1 = jnp.maximum(sqlen1, _MINVAL)

  def pair(sgn):
    t0 = jnp.stack([(e0[0] * sqrad + sgn * r * e0[1] * sqrt0) / den0,
                    (e0[1] * sqrad - sgn * r * e0[0] * sqrt0) / den0])
    t1 = jnp.stack([(e1[0] * sqrad - sgn * r * e1[1] * sqrt1) / den1,
                    (e1[1] * sqrad + sgn * r * e1[0] * sqrt1) / den1])
    return t0, t1

  p1t0, p1t1 = pair(1.0)
  p2t0, p2t1 = pair(-1.0)

  def score(t0, t1):
    crossed = _segments_cross(e0, t0, e1, t1)
    if has_side:
      m = t0 + t1
      nm = _norm(m)
      # mju_normalize degenerate fallback is the unit x vector
      s = jnp.where(nm > _MINVAL, (m @ sd) / jnp.maximum(nm, _MINVAL), sd[0])
    else:
      dt = t0 - t1
      s = -(dt @ dt)
    return jnp.where(crossed, -10000.0, s)

  s1 = score(p1t0, p1t1)
  s2 = score(p2t0, p2t1)
  use2 = s1 <= s2
  t0 = jnp.where(use2, p2t0, p1t0)
  t1 = jnp.where(use2, p2t1, p1t1)
  ok &= ~_segments_cross(e0, t0, e1, t1)

  u0 = t0 / jnp.maximum(_norm(t0), _MINVAL)
  u1 = t1 / jnp.maximum(_norm(t1), _MINVAL)
  angle = jnp.arccos(jnp.clip(u0 @ u1, -1.0, 1.0))
  cr = _cross2(t0, t1)
  shortflag = jnp.where(use2, cr >= 0, cr <= 0)
  angle = jnp.where(shortflag, angle, 2 * jnp.pi - angle)
  wlen = r * angle
  z = jnp.where(ok, 1.0, 0.0)
  return ok, wlen * z, t0 * z, t1 * z


def wrap_inside2d(e0, e1, r):
  """C wrap_inside: single touch point for a sidesite inside the object.

  Returns (touching, P): P is the 2D touch point (both wrap points), and the
  in-plane wrap length is 0 by construction.
  """
  d0 = _norm(e0)
  d1 = _norm(e1)
  ok = (d0 > r) & (d1 > r) & (r >= _MINVAL) & (d0 >= _MINVAL) & (d1 >= _MINVAL)

  dif = e1 - e0
  dd = dif @ dif
  a = _safe_div(-(e0 @ dif), dd)
  interior = (dd > _MINVAL) & (a > 0) & (a < 1)
  seg_dist = _norm(e0 + a * dif)
  ok &= ~(interior & (r >= seg_dist))

  mid = 0.5 * (e0 + e1)
  nm = _norm(mid)
  mid = jnp.where(nm > _MINVAL, mid / jnp.maximum(nm, _MINVAL), mid)
  pmid = r * mid

  cosA = _safe_div(d0 * d0 + d1 * d1 - dd, 2 * d0 * d1)
  ok &= cosA >= -0.999999999999999
  degenerate = cosA > 0.999999999999999

  A = jnp.arccos(jnp.clip(cosA, -1.0, 1.0))
  r0 = _safe_div(r, d0)
  r1 = _safe_div(r, d1)

  f0 = A + jnp.arcsin(jnp.clip(_Z0 * r0, -1, 1)) + jnp.arcsin(
      jnp.clip(_Z0 * r1, -1, 1)) - _TWO_ASIN_Z0
  use_mid = degenerate | (f0 > 0)

  def fval(z):
    return (A + jnp.arcsin(jnp.clip(z * r0, -1, 1)) +
            jnp.arcsin(jnp.clip(z * r1, -1, 1)) - 2 * jnp.arcsin(jnp.clip(z, -1, 1)))

  def body(k, state):
    z, f, fail, done = state
    c0 = jnp.sqrt(jnp.maximum(1 - (z * r0) ** 2, 0.0))
    c1 = jnp.sqrt(jnp.maximum(1 - (z * r1) ** 2, 0.0))
    cz = jnp.sqrt(jnp.maximum(1 - z * z, 0.0))
    fp = (r0 / jnp.maximum(c0, _MINVAL) + r1 / jnp.maximum(c1, _MINVAL)
          - 2.0 / jnp.maximum(cz, _MINVAL))
    stepfail = fp > -_MINVAL
    znew = z - _safe_div(f, fp)
    stepfail |= znew > z
    fnew = fval(znew)
    stepfail |= fnew > 1e-6
    conv = jnp.abs(fnew) <= 1e-6
    active = ~(fail | done)
    z = jnp.where(active & ~stepfail, znew, z)
    f = jnp.where(active & ~stepfail, fnew, f)
    fail = fail | (active & stepfail)
    done = done | (active & conv)
    return z, f, fail, done

  already = jnp.abs(f0) <= 1e-6
  z, _, fail, done = jax.lax.fori_loop(
      0, 19, body, (jnp.asarray(_Z0, e0.dtype), f0, use_mid, already))
  # C takes the mid-touch whenever Newton fails or exhausts its iterations.
  use_mid = fail | ~done

  cross = _cross2(e0, e1)
  pick0 = cross > 0
  ref = jnp.where(pick0, e0, e1)
  rq = jnp.where(pick0, r0, r1)
  beta = jnp.arcsin(jnp.clip(z, -1, 1)) - jnp.arcsin(jnp.clip(z * rq, -1, 1))
  eh = ref / jnp.maximum(_norm(ref), _MINVAL)
  cb = jnp.cos(beta)
  sb = jnp.sin(beta)
  p = r * jnp.stack([cb * eh[0] - sb * eh[1], sb * eh[0] + cb * eh[1]])
  p = jnp.where(use_mid, pmid, p)
  zf = jnp.where(ok, 1.0, 0.0)
  return ok, p * zf


def _sphere_frame(x0, x1):
  """2D wrap plane (axis0, axis1) for a sphere: contains x0, x1, center."""
  d0 = _norm(x0)
  a0 = x0 / jnp.maximum(d0, _MINVAL)
  n = jnp.cross(x0, x1)
  nn = _norm(n)
  # collinear fallback: ones(3) with the largest |a0| component zeroed
  imax = jnp.argmax(jnp.abs(a0))
  v = 1.0 - jax.nn.one_hot(imax, 3, dtype=x0.dtype)
  n2 = jnp.cross(a0, v)
  n = jnp.where(nn < _MINVAL, n2, n)
  n = n / jnp.maximum(_norm(n), _MINVAL)
  a1 = jnp.cross(n, a0)
  na1 = _norm(a1)
  a1 = jnp.where(na1 < _MINVAL,
                 jnp.array([1.0, 0.0, 0.0], dtype=x0.dtype),
                 a1 / jnp.maximum(na1, _MINVAL))
  return a0, a1


def wrap(x0, x1, r, side, is_sphere: bool, has_side: bool):
  """Full mju_wrap in the geom-local frame (geom at origin, axis = +z).

  x0, x1: (3,) local endpoints; side: (3,) local sidesite (ignored unless
  has_side).  Returns (wrapped, wlen, w0, w1) with w0/w1 the (3,) local wrap
  points; wlen is the in-object path length between them (cylinder includes
  the axial component).
  """
  if is_sphere:
    a0, a1 = _sphere_frame(x0, x1)
    e0 = jnp.stack([x0 @ a0, x0 @ a1])
    e1 = jnp.stack([x1 @ a0, x1 @ a1])
  else:
    e0 = x0[:2]
    e1 = x1[:2]

  if has_side:
    if is_sphere:
      s2 = jnp.stack([side @ a0, side @ a1])
    else:
      s2 = side[:2]
    ns = _norm(s2)
    s2 = jnp.where(ns > _MINVAL, s2 / jnp.maximum(ns, _MINVAL),
                   jnp.array([1.0, 0.0], dtype=x0.dtype))
    sd = r * s2
    inside = _norm(side) < r
    ow, owlen, ot0, ot1 = wrap_circle2d(e0, e1, r, sd, True)
    iw, ip = wrap_inside2d(e0, e1, r)
    wrapped = jnp.where(inside, iw, ow)
    wlen2 = jnp.where(inside, 0.0, owlen)
    t0 = jnp.where(inside, ip, ot0)
    t1 = jnp.where(inside, ip, ot1)
  else:
    wrapped, wlen2, t0, t1 = wrap_circle2d(e0, e1, r, None, False)

  if is_sphere:
    w0 = t0[0] * a0 + t0[1] * a1
    w1 = t1[0] * a0 + t1[1] * a1
    return wrapped, wlen2, w0, w1

  # cylinder: interpolate z along the in-plane path (C mju_wrap tail)
  l0 = _norm(e0 - t0)
  l1 = _norm(e1 - t1)
  dz = x1[2] - x0[2]
  tot = jnp.maximum(l0 + wlen2 + l1, _MINVAL)
  z0 = x0[2] + dz * l0 / tot
  z1 = x0[2] + dz * (l0 + wlen2) / tot
  wlen3 = jnp.sqrt(wlen2 * wlen2 + (z1 - z0) ** 2)
  w0 = jnp.concatenate([t0, z0[None]])
  w1 = jnp.concatenate([t1, z1[None]])
  return wrapped, wlen3, w0, w1


# ---------------------------------------------------------------------------
# Spatial tendon program: trace-time decomposition of the wrap chains into
# vectorizable segment groups (mj_tendon's spatial branch).
# ---------------------------------------------------------------------------

import numpy as np

from mjtpu._src import support
from mjtpu._src.types import WrapType


def build_program(m):
  """Decomposes spatial tendons into straight / wrap segment arrays.

  Walks wrap_type/wrap_objid/wrap_prm exactly like mj_tendon: segments run
  between consecutive sites within a branch, a pulley resets the branch and
  sets the divisor for everything after it, and a sphere/cylinder entry
  wraps the segment between its neighbouring sites.  Returns (straight,
  wraps): straight has int arrays (ten, s0, s1) + float divisors; wraps has
  (ten, s0, s1, geom, side) + divisors + bool arrays (is_sphere) per entry,
  ordered by their appearance so Data.ten_wrap_* indexing is stable.
  """
  wrap_type = np.asarray(m.wrap_type)
  wrap_objid = np.asarray(m.wrap_objid)
  wrap_prm = np.asarray(m.wrap_prm)
  adr = np.asarray(m.tendon_adr)
  num = np.asarray(m.tendon_num)

  st = dict(ten=[], s0=[], s1=[], div=[])
  wr = dict(ten=[], s0=[], s1=[], geom=[], side=[], sphere=[], div=[])

  for t in range(m.ntendon):
    lo, hi = int(adr[t]), int(adr[t]) + int(num[t])
    if int(wrap_type[lo]) == int(WrapType.JOINT):
      continue  # fixed tendon: handled by the joint path
    divisor = 1.0
    j = lo
    prev = -1
    while j < hi:
      wt = int(wrap_type[j])
      if wt == int(WrapType.PULLEY):
        divisor = float(wrap_prm[j])
        prev = -1
        j += 1
        continue
      if wt in (int(WrapType.SPHERE), int(WrapType.CYLINDER)):
        # geom between the previous site and the next wrap entry (a site)
        nxt = int(wrap_objid[j + 1])
        wr["ten"].append(t)
        wr["s0"].append(prev)
        wr["s1"].append(nxt)
        wr["geom"].append(int(wrap_objid[j]))
        wr["side"].append(int(wrap_prm[j]))
        wr["sphere"].append(wt == int(WrapType.SPHERE))
        wr["div"].append(divisor)
        prev = nxt
        j += 2
        continue
      # site
      sid = int(wrap_objid[j])
      if prev >= 0:
        st["ten"].append(t)
        st["s0"].append(prev)
        st["s1"].append(sid)
        st["div"].append(divisor)
      prev = sid
      j += 1

  straight = {k: np.asarray(v) for k, v in st.items()}
  wraps = {k: np.asarray(v) for k, v in wr.items()}
  return straight, wraps


def n_wrap_geoms(m) -> int:
  """Number of sphere/cylinder entries across all spatial tendons (static)."""
  if not getattr(m, "nwrap", 0):
    return 0
  wt = np.asarray(m.wrap_type)
  return int(np.sum((wt == int(WrapType.SPHERE)) | (wt == int(WrapType.CYLINDER))))


def _safe_dir(v, dtype):
  """normalize(v) with mju_normalize3's (1,0,0) degenerate fallback."""
  n = _norm(v, axis=-1)[..., None]
  unit = jnp.zeros_like(v).at[..., 0].set(1.0)
  return jnp.where(n < _MINVAL, unit, v / jnp.maximum(n, _MINVAL))


def spatial_tendon(m, d, ten_length, ten_J):
  """Adds spatial tendon lengths/Jacobians (mj_tendon's spatial branch).

  ten_length (ntendon,), ten_J (ntendon, nv) already hold the fixed-tendon
  rows; spatial rows are accumulated into them.  Also returns per-wrap-geom
  world wrap points and active flags for Data.ten_wrap_*.
  """
  straight, wraps = build_program(m)
  dtype = d.qpos.dtype
  mask_np = support.dof_ancestor_mask(m)
  body_rootid = np.asarray(m.body_rootid)
  site_bodyid = np.asarray(m.site_bodyid)
  geom_bodyid = np.asarray(m.geom_bodyid)

  def jrows(points, body_ids, dirs):
    """dir^T jacp rows: (k, nv) for world points on static bodies."""
    mask = jnp.asarray(mask_np[body_ids], dtype)
    offset = points - d.subtree_com[body_rootid[body_ids]]
    # dir.jacp = cdof_lin.dir + cdof_ang.(offset x dir)
    lin = d.cdof[:, 3:] @ dirs.T            # (nv, k)
    ang = d.cdof[:, :3] @ jnp.cross(offset, dirs).T
    return mask * (lin + ang).T

  nwg = len(wraps["ten"]) if wraps["ten"].size else 0
  wrap_xpos = jnp.zeros((nwg, 2, 3), dtype)
  wrap_active = jnp.zeros((nwg,), dtype=bool)

  if straight["ten"].size:
    s0, s1 = straight["s0"], straight["s1"]
    tid = straight["ten"]
    div = jnp.asarray(straight["div"], dtype)
    p0 = d.site_xpos[s0]
    p1 = d.site_xpos[s1]
    dif = p1 - p0
    ln = _norm(dif, axis=-1)
    dirs = _safe_dir(dif, dtype)
    rows = jrows(p1, site_bodyid[s1], dirs) - jrows(p0, site_bodyid[s0], dirs)
    ten_length = ten_length.at[tid].add(ln / div)
    ten_J = ten_J.at[tid].add(rows / div[:, None])

  if nwg:
    # group by (is_sphere, has_side): four static shapes at most
    for sphere in (True, False):
      for has_side in (True, False):
        sel = np.nonzero(
            (wraps["sphere"] == sphere)
            & ((wraps["side"] >= 0) == has_side))[0]
        if not sel.size:
          continue
        tid = wraps["ten"][sel]
        s0, s1 = wraps["s0"][sel], wraps["s1"][sel]
        g = wraps["geom"][sel]
        div = jnp.asarray(wraps["div"][sel], dtype)
        x0 = d.site_xpos[s0]
        x1 = d.site_xpos[s1]
        gx = d.geom_xpos[g]
        gm = d.geom_xmat[g]                     # (k, 3, 3)
        tolocal = lambda p: jnp.einsum("kij,ki->kj", gm, p - gx)
        l0, l1 = tolocal(x0), tolocal(x1)
        if has_side:
          sl = tolocal(d.site_xpos[wraps["side"][sel]])
        else:
          sl = jnp.zeros_like(l0)
        radius = m.geom_size[g, 0]
        wrapped, wlen, w0l, w1l = jax.vmap(
            wrap, in_axes=(0, 0, 0, 0, None, None))(
                l0, l1, radius, sl, sphere, has_side)
        w0 = gx + jnp.einsum("kij,kj->ki", gm, w0l)
        w1 = gx + jnp.einsum("kij,kj->ki", gm, w1l)
        wrap_xpos = wrap_xpos.at[sel].set(jnp.stack([w0, w1], axis=1))
        wrap_active = wrap_active.at[sel].set(wrapped)

        d0 = _norm(w0 - x0, axis=-1)
        d1 = _norm(x1 - w1, axis=-1)
        length_w = d0 + wlen + d1
        length_s = _norm(x1 - x0, axis=-1)
        dir0 = _safe_dir(w0 - x0, dtype)
        dir1 = _safe_dir(x1 - w1, dtype)
        dir_s = _safe_dir(x1 - x0, dtype)
        b0 = site_bodyid[s0]
        b1 = site_bodyid[s1]
        bg = geom_bodyid[g]
        rows_w = (jrows(w0, bg, dir0) - jrows(x0, b0, dir0)
                  + jrows(x1, b1, dir1) - jrows(w1, bg, dir1))
        rows_s = jrows(x1, b1, dir_s) - jrows(x0, b0, dir_s)
        wf = wrapped[:, None]
        ten_length = ten_length.at[tid].add(
            jnp.where(wrapped, length_w, length_s) / div)
        ten_J = ten_J.at[tid].add(jnp.where(wf, rows_w, rows_s) / div[:, None])

  return ten_length, ten_J, wrap_xpos, wrap_active
