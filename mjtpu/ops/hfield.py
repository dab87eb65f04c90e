"""Pallas TPU kernel: batched hfield surface-triangle contact manifolds.

SURVEY.md §2.9 names the hfield prism collision as the second native-kernel
component of this build (reference workload:
mujoco_torch/_src/collision_hfield.py:227-291 prism construction,
:352-390 dispatch — the reference ran it UNCOMPILED with a host loop).
The jnp path here (mjtpu/_src/collision_hfield.py) is fully jitted but
materializes per-pair (T, 3, 3) triangle tensors plus seven (T,) per-
triangle result arrays in HBM, T = 2·(2hy+1)·(2hx+1) (up to 578 at the
hx=hy=8 cap) — the same HBM-materialization shape that motivated the SAT
kernel (ops/sat.py).  This kernel keeps the whole stage in VMEM: it builds
the surface triangles from the (R, C) gathered height window band by band,
runs the segment/point-triangle narrowphase per band, and emits only the
4-point manifold winners.  Only the tiny height window (R·C floats per
pair) crosses HBM on the way in, and 4 contacts on the way out.

All geometry is in the hfield's local frame (terrain up = +z); the caller
rotates the 4 winners to world.  Layout matches ops/sat.py: the pair-
instance batch rides the lanes (TILE=128), triangles ride the sublanes.

Selection semantics replicate collision_hfield._select4 exactly: 4 rounds
of argmin (first index wins ties) with near-duplicate suppression
(|p - p_chosen|^2 < 1e-10 -> +inf), empty rounds emit dist=1, n=(0,0,1).

Gate: custom_vmap seam in collision_hfield._surface_manifold; knob
MJTPU_PALLAS_HFIELD={auto,1,0}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_B = 128


def hfield_vmem_bytes(hy: int, hx: int, dtype_bytes: int = 4) -> int:
  """Rough live-set estimate for one lane tile: 7 result arrays (dist,
  pos xyz, nrm xyz) over T triangles plus band intermediates."""
  t = 2 * (2 * hy + 1) * (2 * hx + 1)
  r, c = 2 * hy + 2, 2 * hx + 2
  return (7 * t + r * c + 30 * c) * _TILE_B * dtype_bytes


def _dot3(a, b):
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _sub3(a, b):
  return [a[0] - b[0], a[1] - b[1], a[2] - b[2]]


def _cross3(a, b):
  return [
      a[1] * b[2] - a[2] * b[1],
      a[2] * b[0] - a[0] * b[2],
      a[0] * b[1] - a[1] * b[0],
  ]


def _normalize3(v):
  """math.normalize semantics: x / where(|x|==0, 1, |x|)."""
  n = jnp.sqrt(_dot3(v, v))
  inv = 1.0 / jnp.where(n == 0.0, jnp.ones_like(n), n)
  return [v[0] * inv, v[1] * inv, v[2] * inv], n


def _closest_seg_pt(a, b, p):
  """math.closest_segment_point in component form."""
  ab = _sub3(b, a)
  denom = jnp.maximum(_dot3(ab, ab), 1e-12)
  t = jnp.clip(_dot3(_sub3(p, a), ab) / denom, 0.0, 1.0)
  return [a[0] + t * ab[0], a[1] + t * ab[1], a[2] + t * ab[2]]


def _closest_on_triangle(a, b, c, p):
  """collision_hfield._closest_on_triangle in component form."""
  n, _ = _normalize3(_cross3(_sub3(b, a), _sub3(c, a)))
  sd = _dot3(_sub3(p, a), n)
  proj = [p[0] - sd * n[0], p[1] - sd * n[1], p[2] - sd * n[2]]
  eab = _dot3(_cross3(_sub3(b, a), n), _sub3(proj, a))
  ebc = _dot3(_cross3(_sub3(c, b), n), _sub3(proj, b))
  eca = _dot3(_cross3(_sub3(a, c), n), _sub3(proj, c))
  inside = ((eab <= 0) & (ebc <= 0) & (eca <= 0)) | (
      (eab >= 0) & (ebc >= 0) & (eca >= 0))
  e1 = _closest_seg_pt(a, b, p)
  e2 = _closest_seg_pt(b, c, p)
  e3 = _closest_seg_pt(c, a, p)
  d1 = _dot3(_sub3(e1, p), _sub3(e1, p))
  d2 = _dot3(_sub3(e2, p), _sub3(e2, p))
  d3 = _dot3(_sub3(e3, p), _sub3(e3, p))
  # 3-way argmin with first-index tie-breaking (jnp.argmin over stack)
  use1 = (d1 <= d2) & (d1 <= d3)
  use2 = (~use1) & (d2 <= d3)
  eb = [jnp.where(use1, e1[k], jnp.where(use2, e2[k], e3[k]))
        for k in range(3)]
  return [jnp.where(inside, proj[k], eb[k]) for k in range(3)]


def _point_triangle(a, b, c, p, r):
  """collision_hfield._point_triangle with up = local +z."""
  n_tri, _ = _normalize3(_cross3(_sub3(b, a), _sub3(c, a)))
  flip = n_tri[2] < 0
  n_tri = [jnp.where(flip, -n_tri[k], n_tri[k]) for k in range(3)]
  sd = _dot3(n_tri, _sub3(p, a))
  proj = [p[0] - sd * n_tri[0], p[1] - sd * n_tri[1], p[2] - sd * n_tri[2]]
  closest = _closest_on_triangle(a, b, c, p)
  inside = _dot3(_sub3(closest, proj), _sub3(closest, proj)) < 1e-16
  to_c = _sub3(p, closest)
  to_c, dc = _normalize3(to_c)
  far = dc >= 1e-12
  n_out = [jnp.where(far, to_c[0], jnp.zeros_like(dc)),
           jnp.where(far, to_c[1], jnp.zeros_like(dc)),
           jnp.where(far, to_c[2], jnp.ones_like(dc))]
  dist = jnp.where(inside, sd, dc) - r
  n = [jnp.where(inside, n_tri[k], n_out[k]) for k in range(3)]
  return dist, n


def _tri_test(a, b, c, pa, pb, r, has_axis):
  """One triangle vs the object's segment (pa, pb) (pa == pb for spheres):
  collision_hfield's capsule core; dist/pos/normal in local frame."""
  if has_axis:
    c1 = _closest_on_triangle(a, b, c, pa)
    c2 = _closest_on_triangle(a, b, c, pb)
    s1 = _closest_seg_pt(pa, pb, c1)
    s2 = _closest_seg_pt(pa, pb, c2)
    c1b = _closest_on_triangle(a, b, c, s1)
    c2b = _closest_on_triangle(a, b, c, s2)
    d1 = _dot3(_sub3(s1, c1b), _sub3(s1, c1b))
    d2 = _dot3(_sub3(s2, c2b), _sub3(s2, c2b))
    use1 = d1 <= d2
    s = [jnp.where(use1, s1[k], s2[k]) for k in range(3)]
  else:
    s = pa
  dist, n = _point_triangle(a, b, c, s, r)
  pos = [s[k] - n[k] * (r + 0.5 * dist) for k in range(3)]
  return dist, pos, n


def _make_kernel(hy: int, hx: int, dx: float, dy: float, has_axis: bool):
  rr, cc = 2 * hy + 2, 2 * hx + 2  # window rows/cols

  def kernel(zw_ref, org_ref, a_ref, b_ref, r_ref,
             dist_ref, pos_ref, nrm_ref):
    """zw (R*C, B) heights; org (2, B) window origin (x0, y0); a/b (3, B)
    object segment endpoints (local frame); r (1, B) radius.
    Outputs: dist (4, B); pos/nrm (12, B) rows [contact*3 + xyz]."""
    dtype = zw_ref.dtype
    x0 = org_ref[0, :][None, :]                       # (1, B)
    y0 = org_ref[1, :][None, :]
    pa = [a_ref[k, :][None, :] for k in range(3)]
    pb = [b_ref[k, :][None, :] for k in range(3)]
    r = r_ref[0, :][None, :]

    # static per-cell x offsets for one band: (C-1, 1)
    colk = jax.lax.broadcasted_iota(jnp.int32, (cc - 1, 1), 0).astype(dtype)
    xs = x0 + colk * dx                               # (C-1, B)

    tri_a, tri_b = [], []
    for rband in range(rr - 1):
      zr0 = zw_ref[pl.ds(rband * cc, cc), :]          # (C, B)
      zr1 = zw_ref[pl.ds((rband + 1) * cc, cc), :]
      z00, z01 = zr0[:-1, :], zr0[1:, :]
      z10, z11 = zr1[:-1, :], zr1[1:, :]
      yr0 = y0 + rband * dy                           # (1, B) -> broadcast
      yr1 = y0 + (rband + 1) * dy
      zeros = jnp.zeros_like(z00)
      p00 = [xs, yr0 + zeros, z00]
      p01 = [xs + dx, yr0 + zeros, z01]
      p10 = [xs, yr1 + zeros, z10]
      p11 = [xs + dx, yr1 + zeros, z11]
      # mj splits each cell along the (00, 11) diagonal
      tri_a.append(_tri_test(p00, p01, p11, pa, pb, r, has_axis))
      tri_b.append(_tri_test(p00, p11, p10, pa, pb, r, has_axis))

    # concat all A-triangle bands then all B bands: matches the jnp path's
    # triangle ordering (argmin tie-breaking depends on it)
    bands = tri_a + tri_b
    dist = jnp.concatenate([t[0] for t in bands], axis=0)     # (T, B)
    px = jnp.concatenate([t[1][0] for t in bands], axis=0)
    py = jnp.concatenate([t[1][1] for t in bands], axis=0)
    pz = jnp.concatenate([t[1][2] for t in bands], axis=0)
    nx = jnp.concatenate([t[2][0] for t in bands], axis=0)
    ny = jnp.concatenate([t[2][1] for t in bands], axis=0)
    nz = jnp.concatenate([t[2][2] for t in bands], axis=0)

    t = dist.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    inf = jnp.asarray(jnp.inf, dtype)
    dwork = dist
    for k in range(4):
      di = jnp.min(dwork, axis=0)                     # (B,)
      i = jnp.argmin(dwork, axis=0).astype(jnp.int32)
      oh = rows == i[None, :]                         # (T, B)
      gather = lambda v: jnp.sum(
          jnp.where(oh, v, jnp.zeros_like(v)), axis=0)
      ok = jnp.isfinite(di)
      cpx = jnp.where(ok, gather(px), jnp.zeros_like(di))
      cpy = jnp.where(ok, gather(py), jnp.zeros_like(di))
      cpz = jnp.where(ok, gather(pz), jnp.zeros_like(di))
      dist_ref[k, :] = jnp.where(ok, di, jnp.ones_like(di))
      pos_ref[3 * k + 0, :] = cpx
      pos_ref[3 * k + 1, :] = cpy
      pos_ref[3 * k + 2, :] = cpz
      nrm_ref[3 * k + 0, :] = jnp.where(ok, gather(nx), jnp.zeros_like(di))
      nrm_ref[3 * k + 1, :] = jnp.where(ok, gather(ny), jnp.zeros_like(di))
      nrm_ref[3 * k + 2, :] = jnp.where(ok, gather(nz), jnp.ones_like(di))
      near = ((px - cpx[None, :]) ** 2 + (py - cpy[None, :]) ** 2
              + (pz - cpz[None, :]) ** 2) < 1e-10
      dwork = jnp.where(near, inf, dwork)

  return kernel


def manifold_batch(zwin, origin, a, b, r, hy, hx, dx, dy, has_axis,
                   interpret: bool = False):
  """Batched hfield surface manifold: zwin (n, R, C) local height windows,
  origin (n, 2) window (x0, y0), a/b (n, 3) object segment endpoints in
  hfield-local frame (a == b for spheres), r (n,) radii.  Returns
  (dist (n, 4), pos (n, 4, 3), nrm (n, 4, 3)) in the local frame."""
  n = zwin.shape[0]
  rr, cc = 2 * hy + 2, 2 * hx + 2
  dtype = zwin.dtype

  pad = (-n) % _TILE_B
  if pad:
    padp = lambda x: jnp.concatenate(
        [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])])
    zwin, origin, a, b, r = map(padp, (zwin, origin, a, b, r))
  nt = zwin.shape[0]

  zw = zwin.reshape(nt, rr * cc).T                    # (R*C, N)
  org = origin.T                                      # (2, N)
  at, bt = a.T, b.T                                   # (3, N)
  rt = r[None, :]                                     # (1, N)

  lane_spec = lambda nrows: pl.BlockSpec(
      (nrows, _TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM)

  dist, pos, nrm = pl.pallas_call(
      _make_kernel(hy, hx, float(dx), float(dy), has_axis),
      out_shape=(
          jax.ShapeDtypeStruct((4, nt), dtype),
          jax.ShapeDtypeStruct((12, nt), dtype),
          jax.ShapeDtypeStruct((12, nt), dtype),
      ),
      grid=(nt // _TILE_B,),
      in_specs=[lane_spec(rr * cc), lane_spec(2), lane_spec(3),
                lane_spec(3), lane_spec(1)],
      out_specs=(lane_spec(4), lane_spec(12), lane_spec(12)),
      interpret=interpret,
  )(zw, org, at, bt, rt)
  return (
      dist.T[:n],
      pos.T[:n].reshape(n, 4, 3),
      nrm.T[:n].reshape(n, 4, 3),
  )
