"""Env-batch sharding over TPU meshes.

Reference capability map: SURVEY.md §2.8 — the reference is single-device
(torch.vmap on one GPU); multi-chip env sharding is this build's new
capability.  Physics ``step`` needs ZERO inter-chip communication (each env
is independent): Data leaves shard on the 'env' mesh axis, Model replicates,
and XLA inserts no collectives in the step itself.  Collectives (psum) only
appear in consumers — RL gradient reductions, metric means — and ride ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mjtpu._src.types import Data, Model


def make_mesh(devices=None, axis: str = "env") -> Mesh:
  """1-D device mesh over all (or the given) devices."""
  devices = devices if devices is not None else jax.devices()
  return Mesh(np.asarray(devices), (axis,))


def env_sharding(mesh: Mesh, axis: str = "env") -> NamedSharding:
  """Sharding that splits the leading (env batch) dim across the mesh."""
  return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(batch: Data, mesh: Mesh, axis: str = "env") -> Data:
  """Places a batched Data pytree with the env axis sharded over the mesh."""
  sh = env_sharding(mesh, axis)
  return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_model(m: Model, mesh: Mesh) -> Model:
  """Replicates Model arrays on every device of the mesh."""
  sh = replicated(mesh)
  return jax.tree.map(lambda x: jax.device_put(x, sh), m)


def sharded_step(m: Model, mesh: Mesh, axis: str = "env"):
  """jit(vmap(step)) with env-sharded in/out: the multi-chip physics step.

  Returns a compiled callable batch -> batch.  Constraint solving, collision
  and integration all stay chip-local; XLA inserts no collectives.  The
  input batch is donated — in-place stepping halves peak HBM at large B.
  """
  import mjtpu

  data_sh = env_sharding(mesh, axis)

  @functools.partial(jax.jit, donate_argnums=0)
  def step_fn(batch: Data) -> Data:
    out = jax.vmap(mjtpu.step, in_axes=(None, 0))(m, batch)
    return jax.lax.with_sharding_constraint(out, data_sh)

  return step_fn
