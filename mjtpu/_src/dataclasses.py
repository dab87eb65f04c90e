"""Pytree dataclass machinery for mjtpu.

Design (SURVEY.md §7 "Model pytree vs static-metadata split"): every struct in
the engine is a frozen dataclass registered as a JAX pytree.  Fields fall into
two classes:

  * **data fields** — ``jax.Array`` leaves, traced under ``jit``/``vmap``.
  * **static fields** — host-side metadata (python ints, numpy index arrays,
    nested static structs).  These ride in the treedef aux data, so ``jit``
    specializes on them (they drive python-level structure: loop unrolling,
    grouping, shapes) without any of the reference's UnbatchedTensor /
    cache-warming machinery (reference: mujoco_torch/_src/dataclasses.py,
    patches/ — all deleted by design, see SURVEY.md §2.10).

Static aux data must be hashable and cheap to compare: we wrap the static
field tuple in :class:`_Static`, which content-hashes numpy arrays by bytes
exactly once and caches the digest (the JAX analog of the reference's
``cache_id``, scan.py:34-41).
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax
import numpy as np

_T = TypeVar("_T")


def static(default: Any = dataclasses.MISSING, **kwargs) -> Any:
  """Marks a dataclass field as static (treedef aux) rather than a leaf."""
  metadata = dict(kwargs.pop("metadata", ()) or {})
  metadata["static"] = True
  if default is not dataclasses.MISSING:
    kwargs["default"] = default
  return dataclasses.field(metadata=metadata, **kwargs)


def _hash_obj(obj: Any) -> int:
  """Deep content hash over python scalars / tuples / numpy arrays."""
  if isinstance(obj, np.ndarray):
    return hash((obj.shape, obj.dtype.str, obj.tobytes()))
  if isinstance(obj, (tuple, list)):
    return hash(tuple(_hash_obj(o) for o in obj))
  if isinstance(obj, dict):
    return hash(tuple((k, _hash_obj(v)) for k, v in sorted(obj.items())))
  return hash(obj)


def _eq_obj(a: Any, b: Any) -> bool:
  if a is b:
    return True
  if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
    return (
        isinstance(a, np.ndarray)
        and isinstance(b, np.ndarray)
        and a.shape == b.shape
        and a.dtype == b.dtype
        and a.tobytes() == b.tobytes()
    )
  if isinstance(a, (tuple, list)) and isinstance(b, (tuple, list)):
    return len(a) == len(b) and all(_eq_obj(x, y) for x, y in zip(a, b))
  if isinstance(a, dict) and isinstance(b, dict):
    return a.keys() == b.keys() and all(_eq_obj(a[k], b[k]) for k in a)
  return a == b


class _Static:
  """Hashable wrapper around a struct's static field values."""

  __slots__ = ("values", "_hash")

  def __init__(self, values: tuple):
    self.values = values
    self._hash: int | None = None

  def __hash__(self) -> int:
    if self._hash is None:
      self._hash = _hash_obj(self.values)
    return self._hash

  def __eq__(self, other: Any) -> bool:
    if self is other:
      return True
    if not isinstance(other, _Static):
      return NotImplemented
    if hash(self) != hash(other):
      return False
    return _eq_obj(self.values, other.values)


_AUX_SLOT = "__mjtpu_aux__"


def mjstruct(cls: type[_T]) -> type[_T]:
  """Decorator: frozen dataclass registered as a pytree with static aux."""
  cls = dataclasses.dataclass(frozen=True, repr=False)(cls)
  all_fields = dataclasses.fields(cls)
  data_names = tuple(f.name for f in all_fields if not f.metadata.get("static"))
  meta_names = tuple(f.name for f in all_fields if f.metadata.get("static"))

  def flatten_with_keys(obj):
    children = tuple(
        (jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in data_names
    )
    aux = obj.__dict__.get(_AUX_SLOT)
    if aux is None:
      aux = _Static(tuple(getattr(obj, n) for n in meta_names))
      object.__setattr__(obj, _AUX_SLOT, aux)
    return children, aux

  def flatten(obj):
    children, aux = flatten_with_keys(obj)
    return tuple(c for _, c in children), aux

  def unflatten(aux, children):
    obj = object.__new__(cls)
    for n, c in zip(data_names, children):
      object.__setattr__(obj, n, c)
    for n, v in zip(meta_names, aux.values):
      object.__setattr__(obj, n, v)
    object.__setattr__(obj, _AUX_SLOT, aux)
    return obj

  jax.tree_util.register_pytree_with_keys(
      cls, flatten_with_keys, unflatten, flatten_func=flatten
  )

  def replace(self: _T, **changes) -> _T:
    return dataclasses.replace(self, **changes)

  def tree_replace(self: _T, params: dict[str, Any]) -> _T:
    """Nested replace: keys like 'opt.timestep' traverse sub-structs."""
    new = self
    for k, v in params.items():
      new = _tree_replace(new, k.split("."), v)
    return new

  def _tree_replace(obj, path, v):
    if len(path) == 1:
      return obj.replace(**{path[0]: v})
    sub = getattr(obj, path[0])
    return obj.replace(**{path[0]: _tree_replace(sub, path[1:], v)})

  def __repr__(self) -> str:
    parts = []
    for f in dataclasses.fields(self):
      v = getattr(self, f.name)
      if hasattr(v, "shape"):
        parts.append(f"{f.name}=<{type(v).__name__} {v.shape}>")
      else:
        parts.append(f"{f.name}={v!r}")
    return f"{cls.__name__}({', '.join(parts[:12])}{', ...' if len(parts) > 12 else ''})"

  cls.replace = replace
  cls.tree_replace = tree_replace
  cls.__repr__ = __repr__
  cls._mjtpu_data_fields = data_names
  cls._mjtpu_meta_fields = meta_names
  return cls
