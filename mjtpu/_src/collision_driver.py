"""Collision driver: candidate enumeration (host) + narrowphase dispatch (device).

Reference capability map: mujoco_torch/_src/collision_driver.py.  The TPU
design keeps the same two-phase structure but the "precomputed index tensor"
machinery disappears: candidate enumeration is plain numpy over the Model's
static fields, run at trace time; narrowphase runs as one ``jax.vmap`` per
homogeneous group (same type pair / hull shape / condim) over stacked geom
poses, so each group is a single batched XLA kernel.

Contacts are ordered by candidate-pair group with groups sorted by condim
(ascending), so ``efc_address`` is a trace-time constant — matching the
reference's condim-sort + cumulative row addressing
(collision_driver.py:842-850).
"""

from __future__ import annotations

import functools
import itertools
import os
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src import math
from mjtpu._src.types import (
    ConeType,
    Contact,
    Data,
    DisableBit,
    GeomType,
    Model,
    NREF,
)

# maximum contact points each narrowphase pair function emits, keyed by
# (GeomType, GeomType) with type1 <= type2.  Superset of the reference's 12
# pair functions (collision_driver.py:106-125): plane/sphere-cylinder and
# plane-ellipsoid are analytic extras, and all remaining cylinder/ellipsoid
# pairs route through the convex SAT path on trace-time hulls.
_PAIR_NCON: dict[tuple[int, int], int] = {
    (GeomType.PLANE, GeomType.SPHERE): 1,
    (GeomType.PLANE, GeomType.CAPSULE): 2,
    (GeomType.PLANE, GeomType.ELLIPSOID): 1,
    (GeomType.PLANE, GeomType.CYLINDER): 4,
    (GeomType.PLANE, GeomType.BOX): 4,
    (GeomType.PLANE, GeomType.MESH): 4,
    (GeomType.HFIELD, GeomType.SPHERE): 4,
    (GeomType.HFIELD, GeomType.CAPSULE): 4,
    (GeomType.HFIELD, GeomType.BOX): 4,
    (GeomType.HFIELD, GeomType.MESH): 4,
    (GeomType.HFIELD, GeomType.ELLIPSOID): 4,
    (GeomType.HFIELD, GeomType.CYLINDER): 4,
    (GeomType.SPHERE, GeomType.SPHERE): 1,
    (GeomType.SPHERE, GeomType.CAPSULE): 1,
    (GeomType.SPHERE, GeomType.ELLIPSOID): 1,
    (GeomType.SPHERE, GeomType.CYLINDER): 1,
    (GeomType.SPHERE, GeomType.BOX): 1,
    (GeomType.SPHERE, GeomType.MESH): 1,
    (GeomType.CAPSULE, GeomType.CAPSULE): 1,
    (GeomType.CAPSULE, GeomType.ELLIPSOID): 2,
    (GeomType.CAPSULE, GeomType.CYLINDER): 2,
    (GeomType.CAPSULE, GeomType.BOX): 2,
    (GeomType.CAPSULE, GeomType.MESH): 2,
    (GeomType.ELLIPSOID, GeomType.ELLIPSOID): 4,
    (GeomType.ELLIPSOID, GeomType.CYLINDER): 4,
    (GeomType.ELLIPSOID, GeomType.BOX): 4,
    (GeomType.ELLIPSOID, GeomType.MESH): 4,
    (GeomType.CYLINDER, GeomType.CYLINDER): 4,
    (GeomType.CYLINDER, GeomType.BOX): 4,
    (GeomType.CYLINDER, GeomType.MESH): 4,
    (GeomType.BOX, GeomType.BOX): 4,
    (GeomType.BOX, GeomType.MESH): 4,
    (GeomType.MESH, GeomType.MESH): 4,
}


def has_collision_fn(t1: int, t2: int) -> bool:
  return (int(t1), int(t2)) in _PAIR_NCON


# ---------------------------------------------------------------------------
# host-side candidate enumeration (numpy over static Model fields)
# ---------------------------------------------------------------------------


def geom_pairs(m: Model) -> Iterator[tuple[int, int, int]]:
  """Yields (geom1, geom2, pair_index) candidate pairs.

  pair_index >= 0 for <pair> table entries, -1 for dynamically generated
  pairs.  Mirrors MuJoCo's mj_collision filtering (contype/conaffinity
  masks, same-weld and parent-child exclusion, <exclude> signatures) —
  reference collision_driver.py:581-615.
  """
  pair_sigs = set()
  for i in range(m.npair):
    g1, g2 = int(m.pair_geom1[i]), int(m.pair_geom2[i])
    if m.geom_type[g1] > m.geom_type[g2]:
      g1, g2 = g2, g1
    pair_sigs.add((g1, g2))
    yield g1, g2, i

  exclude_sigs = set(int(s) for s in m.exclude_signature)
  filterparent = not (m.opt.disableflags & DisableBit.FILTERPARENT)

  for ga, gb in itertools.combinations(range(m.ngeom), 2):
    g1, g2 = (ga, gb) if m.geom_type[ga] <= m.geom_type[gb] else (gb, ga)
    if (g1, g2) in pair_sigs:
      continue
    # contype/conaffinity compatibility
    mask = (m.geom_contype[g1] & m.geom_conaffinity[g2]) | (
        m.geom_contype[g2] & m.geom_conaffinity[g1]
    )
    if not mask:
      continue
    b1, b2 = int(m.geom_bodyid[g1]), int(m.geom_bodyid[g2])
    if b1 == b2:
      continue
    w1, w2 = int(m.body_weldid[b1]), int(m.body_weldid[b2])
    if w1 == w2:
      continue
    wp1 = int(m.body_weldid[m.body_parentid[w1]])
    wp2 = int(m.body_weldid[m.body_parentid[w2]])
    if filterparent and w1 != 0 and w2 != 0 and (w1 == wp2 or w2 == wp1):
      continue
    # exclude signature: body1 << 16 + body2
    if ((b1 << 16) + b2) in exclude_sigs or ((b2 << 16) + b1) in exclude_sigs:
      continue
    yield g1, g2, -1


def _pair_condim(m: Model, g1: int, g2: int, ip: int) -> int:
  """condim for a candidate pair per MuJoCo's priority/max mixing rule."""
  if ip >= 0:
    return int(m.pair_dim[ip])
  p1, p2 = int(m.geom_priority[g1]), int(m.geom_priority[g2])
  if p1 != p2:
    return int(m.geom_condim[g1] if p1 > p2 else m.geom_condim[g2])
  return int(max(m.geom_condim[g1], m.geom_condim[g2]))


def _shape_key(m: Model, g: int):
  """Grouping key: geoms in a group must share hull combinatorics/constants."""
  t = int(m.geom_type[g])
  if t in (GeomType.MESH, GeomType.HFIELD):
    return int(m.geom_dataid[g])
  if t in (GeomType.BOX, GeomType.CYLINDER, GeomType.ELLIPSOID):
    # cylinder/ellipsoid hulls are built from the size (mesh.cylinder/
    # ellipsoid), so like boxes they group by exact size
    return tuple(np.round(m.geom_size_np[g], 12))
  return -1


def candidate_groups(m: Model) -> dict[tuple, list[tuple[int, int, int]]]:
  """Groups candidate pairs by (type1, type2, shape1, shape2, condim).

  Groups are sorted by condim so efc row addressing is static (reference
  collision_driver.py:842-850).
  """
  groups: dict[tuple, list[tuple[int, int, int]]] = {}
  for g1, g2, ip in geom_pairs(m):
    t1, t2 = int(m.geom_type[g1]), int(m.geom_type[g2])
    if not has_collision_fn(t1, t2):
      raise NotImplementedError(
          f"collision between geom types {GeomType(t1).name} and"
          f" {GeomType(t2).name} is not supported"
      )
    condim = _pair_condim(m, g1, g2, ip)
    if condim not in (1, 3, 4, 6):
      raise NotImplementedError(f"condim={condim} not supported")
    key = (t1, t2, _shape_key(m, g1), _shape_key(m, g2), condim)
    groups.setdefault(key, []).append((g1, g2, ip))
  return dict(sorted(groups.items(), key=lambda kv: (kv[0][4], str(kv[0]))))


def max_contact_points(m: Model) -> int | None:
  """Static contact cap from the <numeric name="max_contact_points"> custom
  field (reference collision_driver.py:571-578), or None."""
  target = b"max_contact_points"
  for i in range(len(m.numeric_adr)):
    adr = int(m.name_numericadr[i])
    name = m.names[adr:].split(b"\x00", 1)[0]
    if name == target:
      return int(m.numeric_data[int(m.numeric_adr[i])])
  return None


def max_geom_pairs(m: Model) -> int | None:
  """Static per-group broadphase cap from the <numeric name="max_geom_pairs">
  custom field (same knob as MJX), or the MJTPU_MAX_GEOM_PAIRS env var
  (trace-time read, like MJTPU_MASS_BLOCKS), or None (off — every candidate
  pair is narrowphased, exact parity with MuJoCo C)."""
  env = os.environ.get("MJTPU_MAX_GEOM_PAIRS", "")
  if env:
    return int(env)
  target = b"max_geom_pairs"
  for i in range(len(m.numeric_adr)):
    adr = int(m.name_numericadr[i])
    name = m.names[adr:].split(b"\x00", 1)[0]
    if name == target:
      return int(m.numeric_data[int(m.numeric_adr[i])])
  return None


def _group_npair(m: Model, key: tuple, pairs: list) -> int:
  """Number of pairs actually narrowphased for a group: top-K by
  bound-distance when the max_geom_pairs broadphase cap is set (hfield
  groups are exempt — the field's bounding radius spans the whole terrain,
  so a center-distance rank carries no information)."""
  cap = max_geom_pairs(m)
  if cap is None or key[0] == int(GeomType.HFIELD):
    return len(pairs)
  return max(1, min(len(pairs), cap))


def _raw_ncon(m: Model) -> int:
  if m.opt.disableflags & DisableBit.CONTACT:
    return 0
  n = 0
  for key, pairs in candidate_groups(m).items():
    n += _PAIR_NCON[key[:2]] * _group_npair(m, key, pairs)
  return n


def ncon(m: Model) -> int:
  """Static maximum number of contact points (reference :647-649), after
  the optional max_contact_points cap (top-k by penetration; requires a
  single condim across contacts so efc addressing stays static)."""
  n = _raw_ncon(m)
  cap = max_contact_points(m)
  if cap is not None and n > cap:
    if len(condim_counts(m)) > 1:
      import warnings

      warnings.warn(
          "max_contact_points ignored: contacts mix condims (efc addressing"
          " would become dynamic)"
      )
      return n
    return cap
  return n


def condim_counts(m: Model) -> dict[int, int]:
  """Contact count per condim value (reference device.py:212-223)."""
  counts: dict[int, int] = {}
  if m.opt.disableflags & DisableBit.CONTACT:
    return counts
  for key, pairs in candidate_groups(m).items():
    c = key[4]
    counts[c] = counts.get(c, 0) + _PAIR_NCON[key[:2]] * _group_npair(m, key, pairs)
  cap = max_contact_points(m)
  if cap is not None and len(counts) == 1:
    k = next(iter(counts))
    counts[k] = min(counts[k], cap)
  return counts


def make_condim(m: Model) -> np.ndarray:
  """Static per-contact condim array (capped), group/condim-sorted order."""
  dims = []
  if not (m.opt.disableflags & DisableBit.CONTACT):
    for key, pairs in candidate_groups(m).items():
      dims += [key[4]] * (_PAIR_NCON[key[:2]] * _group_npair(m, key, pairs))
  dims = np.array(dims, dtype=np.int32)
  n = ncon(m)
  return dims[:n]


def contact_efc_address(m: Model, ne: int, nf: int, nl: int) -> np.ndarray:
  """Static efc row address per contact (rows start after ne+nf+nl)."""
  dims = make_condim(m)  # already capped
  if not len(dims):
    return np.zeros(0, np.int32)
  if m.opt.cone == ConeType.PYRAMIDAL:
    rows_per = np.where(dims == 1, 1, (dims - 1) * 2)
  else:
    rows_per = dims
  addr = ne + nf + nl + np.concatenate([[0], np.cumsum(rows_per)[:-1]])
  return addr.astype(np.int32)


# ---------------------------------------------------------------------------
# solver parameter mixing (device, vectorized over a group's pairs)
# ---------------------------------------------------------------------------


def _contact_params(m: Model, pairs: list[tuple[int, int, int]]):
  """Stacked (margin, gap, friction, solref, solreffriction, solimp) for a
  group's pairs.  Mixing per MuJoCo: explicit <pair> rows use the table;
  dynamic rows mix per-geom params by solmix weight with priority override
  (reference collision_driver.py:177-257)."""
  i1 = np.array([p[0] for p in pairs])
  i2 = np.array([p[1] for p in pairs])
  ip = np.array([p[2] for p in pairs])

  # dynamic mixing (computed for all rows, overridden below for table rows)
  p1, p2 = m.geom_priority[i1], m.geom_priority[i2]  # static numpy
  # mj mixes margin/gap by sum for dynamic pairs (oracle-verified)
  margin = m.geom_margin[i1] + m.geom_margin[i2]
  gap = m.geom_gap[i1] + m.geom_gap[i2]

  solmix1, solmix2 = m.geom_solmix[i1], m.geom_solmix[i2]
  mix = solmix1 / (solmix1 + solmix2)
  mix = jnp.where((solmix1 < math.MINVAL) & (solmix2 < math.MINVAL), 0.5, mix)
  mix = jnp.where((solmix1 < math.MINVAL) & (solmix2 >= math.MINVAL), 0.0, mix)
  mix = jnp.where((solmix1 >= math.MINVAL) & (solmix2 < math.MINVAL), 1.0, mix)
  # priority override is static per pair
  mix = jnp.where(
      jnp.asarray(p1 == p2), mix, jnp.asarray((p1 > p2), dtype=mix.dtype)
  )
  mix_ = mix[:, None]

  friction3 = jnp.maximum(m.geom_friction[i1], m.geom_friction[i2])
  eq_prio = jnp.asarray(p1 == p2)[:, None]
  friction3 = jnp.where(
      eq_prio, friction3, jnp.where(mix_ > 0.5, m.geom_friction[i1], m.geom_friction[i2])
  )
  sr1, sr2 = m.geom_solref[i1], m.geom_solref[i2]
  is_standard = (sr1[:, 0:1] > 0) & (sr2[:, 0:1] > 0)
  solref = jnp.where(
      is_standard, jnp.minimum(sr1, sr2), mix_ * sr1 + (1 - mix_) * sr2
  )
  solimp = mix_ * m.geom_solimp[i1] + (1 - mix_) * m.geom_solimp[i2]
  friction = jnp.stack(
      [friction3[:, 0], friction3[:, 0], friction3[:, 1], friction3[:, 2], friction3[:, 2]],
      axis=-1,
  )
  solreffriction = jnp.zeros_like(solref)

  # explicit pair-table overrides (static row mask)
  rows = np.where(ip >= 0)[0]
  if len(rows):
    tp = ip[rows]
    margin = margin.at[rows].set(m.pair_margin[tp])
    gap = gap.at[rows].set(m.pair_gap[tp])
    friction = friction.at[rows].set(m.pair_friction[tp])
    solref = solref.at[rows].set(m.pair_solref[tp])
    solreffriction = solreffriction.at[rows].set(m.pair_solreffriction[tp])
    solimp = solimp.at[rows].set(m.pair_solimp[tp])

  return margin, gap, friction, solref, solreffriction, solimp


# ---------------------------------------------------------------------------
# narrowphase dispatch (device)
# ---------------------------------------------------------------------------


def _collision_fn(m: Model, key: tuple, pairs: list[tuple[int, int, int]]) -> Callable:
  """Returns fn(pos1, mat1, size1, pos2, mat2, size2) -> (dist, pos, frame)
  for one group; hull/hfield constants are closed over via partial."""
  from mjtpu._src import collision_convex, collision_hfield, collision_primitive

  t1, t2, s1, s2 = key[0], key[1], key[2], key[3]
  # hfield subgrid footprint: sized by the colliding objects' own bounding
  # radii (max within the group — static), NOT the model-wide max, which
  # includes the hfield geom itself and blows the static triangle count
  rbound = float(max((m.geom_rbound_np[p[1]] for p in pairs), default=0.0))

  def hull(t, s):
    from mjtpu._src import mesh as mesh_mod

    if t == GeomType.BOX:
      return mesh_mod.box(np.array(s))
    if t == GeomType.CYLINDER:
      return mesh_mod.cylinder(np.array(s))
    if t == GeomType.ELLIPSOID:
      return mesh_mod.ellipsoid(np.array(s))
    if t == GeomType.MESH:
      return m.mesh_convex[s]
    return None

  table: dict[tuple[int, int], Callable] = {
      (GeomType.PLANE, GeomType.SPHERE): lambda: collision_primitive.plane_sphere,
      (GeomType.PLANE, GeomType.CAPSULE): lambda: collision_primitive.plane_capsule,
      (GeomType.PLANE, GeomType.ELLIPSOID): (
          lambda: collision_primitive.plane_ellipsoid
      ),
      (GeomType.PLANE, GeomType.CYLINDER): (
          lambda: collision_primitive.plane_cylinder
      ),
      (GeomType.PLANE, GeomType.BOX): lambda: functools.partial(
          collision_convex.plane_convex, hull2=hull(t2, s2)
      ),
      (GeomType.PLANE, GeomType.MESH): lambda: functools.partial(
          collision_convex.plane_convex, hull2=hull(t2, s2)
      ),
      (GeomType.HFIELD, GeomType.SPHERE): lambda: functools.partial(
          collision_hfield.hfield_sphere, m=m, hid=s1, rbound=rbound
      ),
      (GeomType.HFIELD, GeomType.CAPSULE): lambda: functools.partial(
          collision_hfield.hfield_capsule, m=m, hid=s1, rbound=rbound
      ),
      (GeomType.HFIELD, GeomType.BOX): lambda: functools.partial(
          collision_hfield.hfield_convex, m=m, hid=s1, hull2=hull(t2, s2)
      ),
      (GeomType.HFIELD, GeomType.MESH): lambda: functools.partial(
          collision_hfield.hfield_convex, m=m, hid=s1, hull2=hull(t2, s2)
      ),
      (GeomType.SPHERE, GeomType.SPHERE): lambda: collision_primitive.sphere_sphere,
      (GeomType.SPHERE, GeomType.CAPSULE): lambda: collision_primitive.sphere_capsule,
      (GeomType.SPHERE, GeomType.CYLINDER): (
          lambda: collision_primitive.sphere_cylinder
      ),
      (GeomType.SPHERE, GeomType.BOX): lambda: functools.partial(
          collision_convex.sphere_convex, hull2=hull(t2, s2)
      ),
      (GeomType.SPHERE, GeomType.MESH): lambda: functools.partial(
          collision_convex.sphere_convex, hull2=hull(t2, s2)
      ),
      (GeomType.CAPSULE, GeomType.CAPSULE): lambda: collision_primitive.capsule_capsule,
      (GeomType.CAPSULE, GeomType.BOX): lambda: functools.partial(
          collision_convex.capsule_convex, hull2=hull(t2, s2)
      ),
      (GeomType.CAPSULE, GeomType.MESH): lambda: functools.partial(
          collision_convex.capsule_convex, hull2=hull(t2, s2)
      ),
      (GeomType.BOX, GeomType.BOX): lambda: functools.partial(
          collision_convex.convex_convex, hull1=hull(t1, s1), hull2=hull(t2, s2)
      ),
      (GeomType.BOX, GeomType.MESH): lambda: functools.partial(
          collision_convex.convex_convex, hull1=hull(t1, s1), hull2=hull(t2, s2)
      ),
      (GeomType.MESH, GeomType.MESH): lambda: functools.partial(
          collision_convex.convex_convex, hull1=hull(t1, s1), hull2=hull(t2, s2)
      ),
  }
  # round geoms (cylinder/ellipsoid) against anything not covered above route
  # through the convex SAT path on trace-time hulls (mesh.cylinder/ellipsoid)
  # — capability-plus over the reference (its README excludes these types;
  # SURVEY.md §2.6) and the same meshification MJX applies.
  round_types = (int(GeomType.ELLIPSOID), int(GeomType.CYLINDER))
  if (t1, t2) not in table and (t1 in round_types or t2 in round_types):
    if t1 == GeomType.HFIELD:
      return functools.partial(
          collision_hfield.hfield_convex, m=m, hid=s1, hull2=hull(t2, s2))
    if t1 == GeomType.SPHERE:
      return functools.partial(collision_convex.sphere_convex, hull2=hull(t2, s2))
    if t1 == GeomType.CAPSULE:
      return functools.partial(collision_convex.capsule_convex, hull2=hull(t2, s2))
    return functools.partial(
        collision_convex.convex_convex, hull1=hull(t1, s1), hull2=hull(t2, s2))
  return table[(t1, t2)]()


def collision(m: Model, d: Data) -> Data:
  """Narrowphase collision over all candidate groups -> d.contact.

  Per group: gather geom poses (static indices), ``jax.vmap`` the pair
  function, mix solver params; concat groups (already condim-sorted); bake
  the static efc_address.
  """
  from mjtpu._src import support

  # slots the group loop below actually emits (post-broadphase, pre-cap);
  # ncon(m) is the post-cap count — when they differ the top-k cap branch
  # at the end compacts to the deepest ncon(m) contacts
  total = _raw_ncon(m)
  if ncon(m) == 0:
    return d.replace(contact=Contact.zero(dtype=d.qpos.dtype))

  ne, nf, nl, _ = support.count_constraints(m)
  efc_addr_np = contact_efc_address(m, ne, nf, nl)

  dists, poss, frames = [], [], []
  cmargin, cgap, cfriction, csolref, csolreffriction, csolimp = [], [], [], [], [], []
  g1s, g2s = [], []

  for key, pairs in candidate_groups(m).items():
    fn = _collision_fn(m, key, pairs)
    n_per = _PAIR_NCON[key[:2]]

    i1 = np.array([p[0] for p in pairs])
    i2 = np.array([p[1] for p in pairs])
    params = _contact_params(m, pairs)
    npair = _group_npair(m, key, pairs)

    if npair < len(pairs):
      # broadphase compaction (max_geom_pairs): narrowphase only the K
      # pairs with the smallest sphere-bound distance.  Constraint assembly
      # gathers everything per-contact (geom ids included) so the compacted
      # slots stay fully dynamic; the group's condim is uniform so efc
      # addressing stays static.  Downstream sees at most K·ncon contacts —
      # like MuJoCo's own broadphase this is exact whenever at most K pairs
      # of the group are actually near contact.
      rb = jnp.asarray(m.geom_rbound_np, dtype=d.qpos.dtype)
      # detection buffer is margin + gap (gap-band contacts must survive
      # compaction: adhesion acts on them even though they emit no efc rows)
      margin_all = params[0] + params[1]
      x1, x2 = d.geom_xpos[i1], d.geom_xpos[i2]
      if key[0] == int(GeomType.PLANE):
        # signed height of the object's bounding sphere above the plane
        n_w = d.geom_xmat[i1][..., :, 2]
        bound = jnp.einsum("ij,ij->i", n_w, x2 - x1) - rb[i2] - margin_all
      else:
        bound = (
            jnp.linalg.norm(x2 - x1, axis=-1) - rb[i1] - rb[i2] - margin_all
        )
      _, sel = jax.lax.top_k(-bound, npair)
      i1v, i2v = jnp.asarray(i1)[sel], jnp.asarray(i2)[sel]
      params = tuple(p[sel] for p in params)
    else:
      i1v, i2v = i1, i2

    args = (
        d.geom_xpos[i1v], d.geom_xmat[i1v], m.geom_size[i1v],
        d.geom_xpos[i2v], d.geom_xmat[i2v], m.geom_size[i2v],
    )
    if npair == 1:
      dist, pos, frame = fn(*(a[0] for a in args))
      dist, pos, frame = dist[None], pos[None], frame[None]
    else:
      dist, pos, frame = jax.vmap(fn)(*args)
    # (npair, n_per, ...) -> (npair * n_per, ...)
    dists.append(dist.reshape(-1))
    poss.append(pos.reshape(-1, 3))
    frames.append(frame.reshape(-1, 3, 3))

    margin, gap, friction, solref, solreffriction, solimp = params
    rep = lambda x: jnp.repeat(x, n_per, axis=0)
    cmargin.append(rep(margin))
    cgap.append(rep(gap))
    cfriction.append(rep(friction))
    csolref.append(rep(solref))
    csolreffriction.append(rep(solreffriction))
    csolimp.append(rep(solimp))
    g1s.append(jnp.repeat(jnp.asarray(i1v, dtype=jnp.int32), n_per))
    g2s.append(jnp.repeat(jnp.asarray(i2v, dtype=jnp.int32), n_per))

  margin = jnp.concatenate(cmargin)
  gap = jnp.concatenate(cgap)
  geom1 = jnp.concatenate(g1s).astype(jnp.int32)
  geom2 = jnp.concatenate(g2s).astype(jnp.int32)

  dist = jnp.concatenate(dists)
  contact = Contact(
      dist=dist,
      pos=jnp.concatenate(poss),
      frame=jnp.concatenate(frames),
      # MuJoCo >= 3.x gap semantics (oracle-probed on 3.10): gap is an
      # ADDITIONAL DETECTION buffer beyond margin, not a force-exclusion
      # zone inside it.  includemargin ("margin for force generation") is
      # the mixed margin itself; a slot exists in C's d->contact (exclude
      # 0 or 1) iff dist < margin + gap.
      includemargin=margin,
      margin=margin + gap,
      friction=jnp.concatenate(cfriction),
      solref=jnp.concatenate(csolref),
      solreffriction=jnp.concatenate(csolreffriction),
      solimp=jnp.concatenate(csolimp),
      dim=jnp.asarray(make_condim(m)),
      geom1=geom1,
      geom2=geom2,
      geom=jnp.stack([geom1, geom2], axis=-1),
      efc_address=jnp.asarray(efc_addr_np),
  )

  # optional top-k cap by penetration depth (reference :822-840)
  if total > ncon(m):
    k = ncon(m)
    order = jnp.argsort(dist)[:k]
    contact = Contact(
        dist=dist[order],
        pos=contact.pos[order],
        frame=contact.frame[order],
        includemargin=contact.includemargin[order],
        margin=contact.margin[order],
        friction=contact.friction[order],
        solref=contact.solref[order],
        solreffriction=contact.solreffriction[order],
        solimp=contact.solimp[order],
        dim=jnp.asarray(make_condim(m)),
        geom1=contact.geom1[order],
        geom2=contact.geom2[order],
        geom=contact.geom[order],
        efc_address=jnp.asarray(efc_addr_np[:k]),
    )
  return d.replace(contact=contact)
