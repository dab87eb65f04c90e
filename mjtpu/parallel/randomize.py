"""Domain randomization: per-env batched Model fields.

Capability-plus vs the reference: mujoco-torch has no batched-Model support
(its vmaps batch Data only; verified round 3 — no Model-batched axis anywhere
in /root/reference/mujoco_torch). This module matches the MJX-style RL
workflow instead: sample per-env physics parameters (friction, gains, masses,
damping...), stack them on a leading env axis, and run
``vmap(step, in_axes=(model_axes, 0))`` so every env sees different physics
in one compiled kernel.

The Model pytree makes the mechanics free — traced ``jax.Array`` leaves may
carry a leading batch dim while static fields ride in the treedef — but the
*boundary* is subtle: anything consumed by trace-time python (sizes, types,
gates, index schedules, baked hulls) cannot vary per env. ``randomize``
validates exactly that boundary and raises actionable errors instead of
letting a silently-wrong simulation through:

  * static fields (``geom_type``, ``jnt_range`` two-sidedness flips, ...)
    are rejected outright;
  * fields gated by a static ``has_*`` flag (``dof_damping`` on a model
    compiled without damping, ...) are rejected when the gate is off —
    ``put_model`` dead-code-eliminated the consuming branch;
  * fields whose *value pattern* bakes static structure
    (``dof_frictionloss`` nonzero set, limit-range two-sidedness) are
    checked element-wise against the baked pattern;
  * ``geom_size`` may only vary on round primitives (sphere/capsule/
    ellipsoid/cylinder) — box and mesh collisions run on convex hulls baked
    from the host-side size copy at ``put_model`` time.

Derived-constant caveat (same as MJX): randomizing ``body_mass`` /
``body_inertia`` does NOT recompute MuJoCo's derived constants
(``body_invweight0``, ``dof_invweight0``, ``dof_M0``, ``actuator_acc0``,
``stat.meaninertia`` — C's ``mj_setConst`` outputs). Dynamics use the
randomized mass through CRBA/RNE exactly; the stale fields only scale
constraint regularization and muscle normalization. Pass batched values for
those fields too if you need them exact.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src.types import Data, GeomType, Model
from mjtpu.parallel.sharding import env_sharding, replicated

# fields whose consuming code path is dead-code-eliminated at trace time when
# the static gate is False (io.py gate derivations)
_GATED = {
    "dof_damping": "has_dof_damping",
    "jnt_stiffness": "has_jnt_spring",
    "tendon_stiffness": "has_tendon_spring",
    "tendon_damping": "has_tendon_damping",
    "tendon_armature": "has_tendon_armature",
    "body_gravcomp": "has_gravcomp",
}

# geom types whose collision math reads the traced geom_size (the rest run
# on hulls baked from the static host copy at put_model)
_ROUND_GEOMS = (
    int(GeomType.SPHERE),
    int(GeomType.CAPSULE),
    int(GeomType.ELLIPSOID),
    int(GeomType.CYLINDER),
)


def _resolve(obj: Any, path: list[str], full: str) -> Any:
  """Walks a dotted field path, erroring on static or unknown fields."""
  for i, seg in enumerate(path):
    cls = type(obj)
    meta = getattr(cls, "_mjtpu_meta_fields", ())
    data = getattr(cls, "_mjtpu_data_fields", ())
    if seg in meta:
      raise ValueError(
          f"'{full}' is a static (trace-time) field of {cls.__name__}: it is"
          " baked into the compiled program's structure and cannot vary per"
          " env. Randomize traced fields only; to change structure, load a"
          " separate Model per variant."
      )
    if seg not in data:
      raise ValueError(f"'{full}': {cls.__name__} has no traced field '{seg}'")
    obj = getattr(obj, seg)
    if obj is None and i < len(path) - 1:
      raise ValueError(f"'{full}': '{seg}' is None on this model")
  return obj


def _is_concrete(v: Any) -> bool:
  return not isinstance(v, jax.core.Tracer)


def _check_patterns(m: Model, key: str, v: np.ndarray) -> None:
  """Value-pattern checks: randomized values must preserve the static
  structure put_model derived from the base values (io.py:218-245)."""
  if key == "dof_frictionloss":
    mask = np.zeros(m.nv, bool)
    mask[np.asarray(m.friction_dofid)] = True
    if not ((v > 0) == mask).all():
      raise ValueError(
          "dof_frictionloss randomization must keep the nonzero-dof set"
          f" fixed (static friction rows): baked set {np.nonzero(mask)[0]}."
          " Vary magnitudes only; zeros must stay zero and vice versa."
      )
  elif key == "tendon_frictionloss":
    mask = np.zeros(m.ntendon, bool)
    mask[np.asarray(m.friction_tenid)] = True
    if not ((v > 0) == mask).all():
      raise ValueError(
          "tendon_frictionloss randomization must keep the nonzero-tendon"
          f" set fixed (static friction rows): baked set {np.nonzero(mask)[0]}."
      )
  elif key in ("jnt_range", "jnt_margin"):
    rng = v if key == "jnt_range" else np.asarray(m.jnt_range)
    mrg = v if key == "jnt_margin" else np.asarray(m.jnt_margin)
    two = rng[..., 1] - rng[..., 0] < 2 * mrg
    if not (two == np.asarray(m.jnt_limit_two_sided)).all():
      raise ValueError(
          f"{key} randomization flips a joint's limit two-sidedness"
          " (range width vs 2*margin), which selects the static limit-row"
          " layout. Keep ranges on the same side of the 2*margin threshold."
      )
  elif key in ("tendon_range", "tendon_margin"):
    rng = v if key == "tendon_range" else np.asarray(m.tendon_range)
    mrg = v if key == "tendon_margin" else np.asarray(m.tendon_margin)
    two = rng[..., 1] - rng[..., 0] < 2 * mrg
    if not (two == np.asarray(m.tendon_limit_two_sided)).all():
      raise ValueError(
          f"{key} randomization flips a tendon's limit two-sidedness;"
          " the static limit-row layout cannot vary per env."
      )
  elif key == "geom_size":
    base = np.asarray(m.geom_size_np)
    varies = np.any(v != base, axis=(0, 2))  # (ngeom,): any env differs
    bad = varies & ~np.isin(np.asarray(m.geom_type), _ROUND_GEOMS)
    if bad.any():
      names = np.nonzero(bad)[0]
      raise ValueError(
          f"geom_size varies across the batch for geoms {names} whose type"
          " is not a round primitive. Box/mesh collisions run on convex"
          " hulls baked at put_model time from the host size copy, so their"
          " sizes cannot vary per env (sphere/capsule/ellipsoid/cylinder"
          " read the traced size and randomize fine)."
      )


def model_axes(m: Model, batched: Model) -> Model:
  """Infers the ``vmap``/``shard_map`` in_axes pytree for a batched Model.

  Leaves that carry one extra leading dim in ``batched`` map on axis 0; all
  other leaves map on None (broadcast). Pass the result as the Model entry
  of ``in_axes``: ``jax.vmap(step, in_axes=(model_axes(m, mb), 0))(mb, db)``.
  """
  return jax.tree.map(
      lambda a, b: 0 if np.ndim(b) == np.ndim(a) + 1 else None, m, batched
  )


def randomize(m: Model, updates: dict[str, Any]) -> tuple[Model, Model]:
  """Builds a per-env randomized Model batch plus its vmap axes tree.

  Args:
    m: the base (unbatched) Model from ``put_model``.
    updates: maps traced field paths (``"geom_friction"``,
      ``"actuator_gainprm"``, ``"opt.timestep"``, ...) to arrays of shape
      ``(B, *field.shape)`` — one row per env, typically sampled with
      ``jax.vmap(sample_fn)(jax.random.split(key, B))``.

  Returns:
    ``(batched_model, axes)`` where ``axes`` is the in_axes pytree
    (0 on randomized leaves, None elsewhere). Step every env with its own
    physics via ``jax.vmap(step, in_axes=(axes, 0))(batched_model, batch)``.

  Raises:
    ValueError: on static fields, off structural gates, shape mismatches,
      inconsistent batch sizes, or value patterns that would invalidate the
      trace-time structure baked by ``put_model`` (see module docstring).
  """
  if not updates:
    raise ValueError("randomize() needs at least one field update")
  batch = None
  casted: dict[str, jax.Array] = {}
  for key, v in updates.items():
    base = _resolve(m, key.split("."), key)
    if base is None:
      raise ValueError(f"'{key}' is None on this model (absent subsystem)")
    base_shape = tuple(np.shape(base))
    v_shape = tuple(np.shape(v))
    if len(v_shape) != len(base_shape) + 1 or v_shape[1:] != base_shape:
      raise ValueError(
          f"'{key}': expected shape (B, *{base_shape}), got {v_shape}"
      )
    if batch is None:
      batch = v_shape[0]
    elif v_shape[0] != batch:
      raise ValueError(
          f"inconsistent batch sizes: '{key}' has {v_shape[0]}, earlier"
          f" fields have {batch}"
      )
    gate = _GATED.get(key)
    if gate is not None and not getattr(m, gate):
      raise ValueError(
          f"'{key}' cannot be randomized: the base model has all-zero"
          f" {key}, so put_model baked {gate}=False and the consuming code"
          " path was never traced. Re-load the model with a nonzero value"
          " (e.g. a tiny epsilon in the MJCF) to enable the gate."
      )
    if key == "geom_fluid" and not m.opt.has_fluid_params:
      raise ValueError(
          "'geom_fluid' cannot be randomized: opt.has_fluid_params is"
          " False, so the fluid force path was never traced. Set a nonzero"
          " density/viscosity or per-geom fluidshape in the MJCF."
      )
    if _is_concrete(v):
      _check_patterns(m, key, np.asarray(v))
    casted[key] = jnp.asarray(v, dtype=jnp.asarray(base).dtype)
  mb = m.tree_replace(casted)
  axes = jax.tree.map(lambda x: None, m)
  axes = axes.tree_replace({k: 0 for k in casted})
  return mb, axes


# mjModel fields mj_setConst derives from masses/inertias/geometry, mapped to
# their traced Model paths (the stale-derived-constant caveat in the module
# docstring; recomputed per env by `randomize_with_consts`)
_CONST_FIELDS = (
    "body_subtreemass",
    "body_invweight0",
    "dof_invweight0",
    "dof_M0",
    "tendon_invweight0",
    "tendon_length0",
    "actuator_acc0",
)


def randomize_with_consts(
    mjm, m: Model, updates: dict[str, Any]
) -> tuple[Model, Model]:
  """`randomize`, plus exact per-env derived constants via ``mj_setConst``.

  Randomizing masses/inertias/geometry leaves MuJoCo's derived constants
  (``body_invweight0``, ``dof_M0``, ``stat.meaninertia``, ...) stale, which
  skews constraint regularization and muscle normalization. This variant
  writes each env's updates into a scratch copy of the source ``MjModel``,
  runs C's ``mj_setConst``, and batches the recomputed constants alongside
  the requested fields. Host-side setup cost is O(B) ``mj_setConst`` calls.

  Args:
    mjm: the ``mujoco.MjModel`` that ``m`` was built from.
    m: the base Model from ``put_model(mjm)``.
    updates: as in `randomize`; values must be concrete (host) arrays.

  Returns:
    ``(batched_model, axes)`` as in `randomize`, with the derived-constant
    fields batched too.
  """
  import copy

  import mujoco

  for key, v in updates.items():
    if not _is_concrete(v):
      raise ValueError(
          f"randomize_with_consts needs concrete update values ('{key}' is"
          " a tracer): mj_setConst runs on the host at setup time."
      )
  B = next(iter(updates.values())).shape[0]
  scratch = copy.copy(mjm)
  d_scratch = mujoco.MjData(scratch)
  derived: dict[str, list[np.ndarray]] = {k: [] for k in _CONST_FIELDS}
  derived["stat.meaninertia"] = []
  for i in range(B):
    for key, v in updates.items():
      tgt = scratch
      *parents, leaf = key.split(".")
      for p in parents:
        tgt = getattr(tgt, p)
      arr = getattr(tgt, leaf)
      if np.ndim(arr):
        arr[...] = np.asarray(v)[i]
      else:  # scalar field (e.g. opt.timestep): not writable in place
        setattr(tgt, leaf, np.asarray(v)[i].item())
    mujoco.mj_setConst(scratch, d_scratch)
    for name in _CONST_FIELDS:
      derived[name].append(np.array(getattr(scratch, name)))
    derived["stat.meaninertia"].append(np.float64(scratch.stat.meaninertia))
  full = dict(updates)
  for name, rows in derived.items():
    if name in full:
      continue  # caller supplied their own values: respect them
    base = _resolve(m, name.split("."), name)
    if base is None or not np.size(np.asarray(rows[0])):
      continue  # absent subsystem (e.g. no tendons/actuators)
    full[name] = np.stack(rows)
  return randomize(m, full)


def randomized_step(m: Model, updates: dict[str, Any]):
  """Convenience: jitted ``vmap(step)`` over per-env physics.

  Returns ``(step_fn, batched_model)`` where ``step_fn(batch) -> batch``
  steps env ``i`` of the Data batch under row ``i`` of every randomized
  field. The Data batch size must equal the update batch size.
  """
  import mjtpu

  mb, axes = randomize(m, updates)
  step_b = jax.jit(jax.vmap(mjtpu.step, in_axes=(axes, 0)))
  return functools.partial(step_b, mb), mb


def sharded_randomized_step(
    m: Model, updates: dict[str, Any], mesh, axis: str = "env"
):
  """Multi-chip domain randomization: env batch AND randomized model fields
  shard together on the mesh's env axis; unrandomized Model leaves replicate.

  The step still needs zero inter-chip communication — each env owns its
  physics row. Returns ``(step_fn, batched_model)`` like `randomized_step`.
  """
  import mjtpu

  mb, axes = randomize(m, updates)
  data_sh = env_sharding(mesh, axis)
  repl = replicated(mesh)
  mb = jax.tree.map(
      lambda x, a: jax.device_put(x, data_sh if a == 0 else repl), mb, axes
  )

  @functools.partial(jax.jit, donate_argnums=1)
  def step_fn(mb: Model, batch: Data) -> Data:
    out = jax.vmap(mjtpu.step, in_axes=(axes, 0))(mb, batch)
    return jax.lax.with_sharding_constraint(out, data_sh)

  return functools.partial(step_fn, mb), mb
