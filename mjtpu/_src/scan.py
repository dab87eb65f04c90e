"""Iteration substrate: grouped entity scans over the kinematic structure.

Reference capability map: mujoco_torch/_src/scan.py (flat, body_tree,
segment_sum — "the structural heart", SURVEY.md §2.3).  The TPU build keeps
the same two primitives but none of the cache machinery: grouping is plain
numpy over static Model fields executed at trace time (tracing happens once
per model), per-group calls are ``jax.vmap``, and static per-group arguments
are closed over as python values so they drive trace-time control flow.

Type characters (an arg/out's entity axis):
  'b' body   (nbody)      'j' joint (njnt)     'q' qpos (nq)   'v' dof (nv)
  'u' actuator (nu)       'a' act   (na)       'c' camera (ncam)
  's' site (nsite)

Arguments that are numpy arrays are *static*: they must be constant within a
group (they define the group key) and are passed to ``f`` as host values.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src.types import JointType, Model


def segment_sum(data: jax.Array, segment_ids, num_segments: int) -> jax.Array:
  """Sums rows of data into num_segments buckets (deterministic on TPU —
  XLA lowers scatter-add without atomics; reference needed a gather-based
  rewrite, scan.py:411-438, which is unnecessary here)."""
  return jax.ops.segment_sum(
      data, jnp.asarray(segment_ids), num_segments=num_segments
  )


# ---------------------------------------------------------------------------
# host-side structure helpers
# ---------------------------------------------------------------------------


def _q_width(jtyp: int) -> int:
  return JointType(jtyp).qpos_width()


def _v_width(jtyp: int) -> int:
  return JointType(jtyp).dof_width()


@functools.lru_cache(maxsize=128)
def _body_structure(key):
  """Cached per-model body structure (depth, joint/q/v index lists)."""
  parentid, jntadr, jntnum, jnt_type, jnt_qposadr, jnt_dofadr = key
  parentid = np.array(parentid)
  nbody = len(parentid)
  depth = np.zeros(nbody, dtype=np.int64)
  for i in range(1, nbody):
    depth[i] = depth[parentid[i]] + 1
  levels = [np.where(depth == l)[0] for l in range(depth.max() + 1)]
  return depth, levels


def body_levels(m: Model) -> list[np.ndarray]:
  key = (
      tuple(int(x) for x in m.body_parentid),
      tuple(int(x) for x in m.body_jntadr),
      tuple(int(x) for x in m.body_jntnum),
      tuple(int(x) for x in m.jnt_type),
      tuple(int(x) for x in m.jnt_qposadr),
      tuple(int(x) for x in m.jnt_dofadr),
  )
  return _body_structure(key)[1]


def _body_sig(m: Model, b: int) -> tuple:
  """Joint-type signature of a body (the grouping key for 'j' scans)."""
  ja, jn = int(m.body_jntadr[b]), int(m.body_jntnum[b])
  return tuple(int(m.jnt_type[j]) for j in range(ja, ja + jn))


def _body_q_indices(m: Model, b: int) -> list[int]:
  idx = []
  ja, jn = int(m.body_jntadr[b]), int(m.body_jntnum[b])
  for j in range(ja, ja + jn):
    qa = int(m.jnt_qposadr[j])
    idx += list(range(qa, qa + _q_width(m.jnt_type[j])))
  return idx

def _body_v_indices(m: Model, b: int) -> list[int]:
  idx = []
  ja, jn = int(m.body_jntadr[b]), int(m.body_jntnum[b])
  for j in range(ja, ja + jn):
    va = int(m.jnt_dofadr[j])
    idx += list(range(va, va + _v_width(m.jnt_type[j])))
  return idx


def _entity_count(m: Model, typ: str) -> int:
  return {
      'b': m.nbody, 'j': m.njnt, 'q': m.nq, 'v': m.nv,
      'u': m.nu, 'a': m.na, 'c': m.ncam, 's': m.nsite,
  }[typ]


def _gather_indices(m: Model, ids: np.ndarray, typ: str) -> np.ndarray:
  """Static index matrix selecting each entity's rows of a typ-axis array."""
  if typ in ('b', 'u', 'c', 's'):
    return ids.reshape(-1, 1)
  if typ == 'j':
    return np.array(
        [list(range(int(m.body_jntadr[b]), int(m.body_jntadr[b]) + int(m.body_jntnum[b]))) for b in ids],
        dtype=np.int64,
    ).reshape(len(ids), -1)
  if typ == 'q':
    return np.array([_body_q_indices(m, b) for b in ids], dtype=np.int64).reshape(len(ids), -1)
  if typ == 'v':
    return np.array([_body_v_indices(m, b) for b in ids], dtype=np.int64).reshape(len(ids), -1)
  raise ValueError(typ)


def _take(arg, idx: np.ndarray, typ: str):
  """Gathers group rows. 'b'-like types keep a plain (n, ...) batch axis."""
  if typ in ('b', 'u', 'c', 's'):
    return arg[idx[:, 0]]
  return arg[idx]


class _GroupCall:
  """Wraps f so static (numpy) args are closed over, traced args vmapped."""

  def __init__(self, f, static_vals, is_static, has_carry):
    self.f = f
    self.static_vals = static_vals
    self.is_static = is_static
    self.has_carry = has_carry

  def __call__(self, carry, traced_args):
    def g(carry_, *traced):
      it = iter(traced)
      sit = iter(self.static_vals)
      full = [next(sit) if s else next(it) for s in self.is_static]
      return self.f(carry_, *full)

    if self.has_carry:
      return jax.vmap(g)(carry, *traced_args)
    return jax.vmap(functools.partial(g, None))(*traced_args)


def _scatter(out_acc: dict, slot: int, typ: str, idx: np.ndarray, val, m: Model):
  """Accumulates (idx, val) scatters; allocation happens on first write."""
  if typ in ('b', 'u', 'c', 's'):
    flat_idx, flat_val = idx[:, 0], val
  else:
    if idx.shape[1] == 0:
      return
    flat_idx = idx.reshape(-1)
    flat_val = val.reshape((-1,) + val.shape[2:])
  if slot not in out_acc:
    n = _entity_count(m, typ)
    out_acc[slot] = jnp.zeros((n,) + flat_val.shape[1:], dtype=flat_val.dtype)
  out_acc[slot] = out_acc[slot].at[flat_idx].set(flat_val)


def _static_signature(args, in_types, idx_per_type, ids) -> tuple:
  """Group key contribution from static args (values must match in-group)."""
  sig = []
  for a, t in zip(args, in_types):
    if isinstance(a, np.ndarray):
      gi = idx_per_type[t]
      sig.append(tuple(np.asarray(a[gi[0]]).reshape(-1).tolist()))
  return tuple(sig)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def flat(
    m: Model,
    f: Callable,
    in_types: str,
    out_types: str,
    *args,
    group_by: str = 'j',
) -> Any:
  """Groups entities by static signature, runs vmap(f) per group, reorders.

  group_by='j': entities are bodies, grouped by joint-type signature
  (reference scan.py:663-755).  group_by='u': entities are actuators,
  grouped by the values of all static args.
  """
  if group_by == 'j':
    n_ent = m.nbody
    ent_sig = lambda i: _body_sig(m, i)
  elif group_by == 'u':
    n_ent = m.nu
    ent_sig = lambda i: tuple(
        int(np.asarray(a[i]).reshape(-1)[0]) if isinstance(a, np.ndarray) else 0
        for a, t in zip(args, in_types)
        if t == 'u' and isinstance(a, np.ndarray)
    )
  elif group_by == 'c':
    n_ent = m.ncam
    ent_sig = lambda i: tuple(
        int(np.asarray(a[i]).reshape(-1)[0])
        for a, t in zip(args, in_types)
        if t == 'c' and isinstance(a, np.ndarray)
    )
  else:
    raise ValueError(group_by)

  groups: dict[tuple, list[int]] = {}
  for i in range(n_ent):
    groups.setdefault(ent_sig(i), []).append(i)

  out_acc: dict[int, jax.Array] = {}
  for _, ids_list in sorted(groups.items()):
    ids = np.array(ids_list)
    idx_per_type = {t: _gather_indices(m, ids, t) for t in set(in_types + out_types)}
    is_static = [isinstance(a, np.ndarray) for a in args]
    static_vals = [
        _take(a, idx_per_type[t], t)[0]
        for a, t, s in zip(args, in_types, is_static)
        if s
    ]
    traced = [
        _take(a, idx_per_type[t], t)
        for a, t, s in zip(args, in_types, is_static)
        if not s
    ]
    f_nocarry = lambda _carry, *a: f(*a)
    res = _GroupCall(f_nocarry, static_vals, is_static, has_carry=False)(
        None, traced
    )
    if not isinstance(res, tuple):
      res = (res,)
    for slot, (typ, val) in enumerate(zip(out_types, res)):
      _scatter(out_acc, slot, typ, idx_per_type[typ], val, m)

  outs = tuple(out_acc.get(i) for i in range(len(out_types)))
  return outs if len(out_types) > 1 else outs[0]


def body_tree(
    m: Model,
    f: Callable,
    in_types: str,
    out_types: str,
    *args,
    reverse: bool = False,
) -> Any:
  """Level-wise scan over the kinematic tree (reference scan.py:875-981).

  Forward (root->leaf): f's carry is the tuple of the parent's 'b'-typed
  outputs (None at the root level).  Reverse (leaf->root): carry is the sum
  of the direct children's 'b'-typed outputs (None at leaf-only levels) —
  f must treat a zero carry the same as None (additive accumulators).
  """
  levels = body_levels(m)
  parentid = np.asarray(m.body_parentid)
  b_slots = [i for i, t in enumerate(out_types) if t == 'b']

  out_acc: dict[int, jax.Array] = {}
  order = range(len(levels) - 1, -1, -1) if reverse else range(len(levels))

  for li in order:
    level_ids = levels[li]
    # group bodies in this level by joint signature + static arg signature
    groups: dict[tuple, list[int]] = {}
    for b in level_ids:
      groups.setdefault(_body_sig(m, int(b)), []).append(int(b))

    for _, ids_list in sorted(groups.items()):
      ids = np.array(ids_list)
      idx_per_type = {t: _gather_indices(m, ids, t) for t in set(in_types + out_types)}
      is_static = [isinstance(a, np.ndarray) for a in args]
      static_vals = [
          _take(a, idx_per_type[t], t)[0]
          for a, t, s in zip(args, in_types, is_static)
          if s
      ]
      traced = [
          _take(a, idx_per_type[t], t)
          for a, t, s in zip(args, in_types, is_static)
          if not s
      ]

      carry = None
      if not b_slots:
        pass
      elif not reverse and li > 0:
        carry = tuple(out_acc[s][parentid[ids]] for s in b_slots)
      elif reverse and li < len(levels) - 1:
        # sum of direct children's outputs (children live at level li+1)
        child_mask = np.isin(parentid[levels[li + 1]], ids)
        child_ids = levels[li + 1][child_mask]
        if len(child_ids):
          pos_of = {b: k for k, b in enumerate(ids_list)}
          seg = np.array([pos_of[int(parentid[c])] for c in child_ids])
          carry = tuple(
              segment_sum(out_acc[s][child_ids], seg, len(ids)) for s in b_slots
          )

      if carry is not None and len(carry) == 1:
        carry = carry[0]

      res = _GroupCall(f, static_vals, is_static, has_carry=carry is not None)(
          carry, traced
      )
      if not isinstance(res, tuple):
        res = (res,)
      for slot, (typ, val) in enumerate(zip(out_types, res)):
        _scatter(out_acc, slot, typ, idx_per_type[typ], val, m)

  outs = tuple(out_acc.get(i) for i in range(len(out_types)))
  return outs if len(out_types) > 1 else outs[0]
