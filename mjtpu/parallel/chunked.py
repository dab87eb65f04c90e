"""Dispatch chunking: split an env batch into K independent pipelined steps.

Why this exists: per-dispatch *execution time* has a hard ceiling on some
TPU runtimes (the tunneled test rig faults past ~1.7 ms and wedges the
chip; see PERFORMANCE.md "Batch chunking"), and even on healthy runtimes a
single monolithic dispatch serializes host dispatch latency with device
compute.  Because envs are independent (``vmap`` carries no cross-env
dataflow), a batch of B envs can be split into K chunks of B/K and stepped
as K *independent* async dispatches: XLA pipelines them (chunk k+1's host
dispatch overlaps chunk k's device execution) and trajectories are
identical to the unchunked step.

The reference has no analog — it is single-dispatch per step by
construction (``torch.compile(vmap(step))``; reference forward.py step);
its only dispatch-shaping knob is ``fixed_iterations``.  This module is the
engine-level generalization of the MJTPU_BENCH_CHUNKS bench experiment the
round-3 A/B validated (B=262144 humanoid: unchunked wedges the tunnel,
chunked runs at 238M steps/s).

Auto-K: ``chunks="auto"`` estimates per-dispatch time from the *compiled*
step's cost analysis (``compiled.cost_analysis()`` flops, measured on a
small probe batch and scaled linearly — vmap FLOPs are linear in B) against
an achievable-FLOP-rate prior, and picks the smallest divisor of B that
keeps the estimate under ``target_ms``.  Knobs:

  MJTPU_CHUNK_TARGET_MS   per-dispatch time budget (default 1.2)
  MJTPU_CHUNK_FLOP_RATE   achievable flops/s prior (default 5e13 —
                          the ~65 TFLOP/s this engine sustains on v5e,
                          derated; see PERFORMANCE.md MFU notes)

Usage::

    stepper = chunked_step(m, chunks="auto")     # or chunks=8
    parts = stepper.split(batch)                 # once per rollout
    for _ in range(n):
      parts = stepper.step_parts(parts)          # K pipelined dispatches
    batch = stepper.join(parts)                  # once per rollout

    batch = stepper(batch)                       # convenience one-shot

For K=1 this is exactly ``jit(vmap(step))`` — zero overhead.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from mjtpu._src.types import Data, Model


def _leading_dim(batch: Data) -> int:
  sizes = {x.shape[0] for x in jax.tree.leaves(batch) if hasattr(x, "shape")}
  if len(sizes) != 1:
    raise ValueError(f"inconsistent leading (env) dims in batch: {sizes}")
  return sizes.pop()


def _divisors(n: int) -> list[int]:
  out = [k for k in range(1, int(math.isqrt(n)) + 1) if n % k == 0]
  return sorted(set(out + [n // k for k in out]))


class ChunkedStepper:
  """Steps an env batch as K independent pipelined dispatches.

  The compiled function is ``jit(vmap(step))`` over one chunk; every chunk
  reuses the same executable (same shapes), and the input chunk is donated
  (state-in/state-out aliasing, like the bench harness).
  """

  def __init__(
      self,
      m: Model,
      chunks: int | str = "auto",
      *,
      step_fn: Callable[[Model, Data], Data] | None = None,
      donate: bool = True,
      target_ms: float | None = None,
      flop_rate: float | None = None,
  ):
    if step_fn is None:
      import mjtpu

      step_fn = mjtpu.step
    self.m = m
    self._chunks = chunks
    self._target_ms = target_ms if target_ms is not None else float(
        os.environ.get("MJTPU_CHUNK_TARGET_MS", "1.2"))
    self._flop_rate = flop_rate if flop_rate is not None else float(
        os.environ.get("MJTPU_CHUNK_FLOP_RATE", "5e13"))
    self._jit = jax.jit(
        jax.vmap(step_fn, in_axes=(None, 0)),
        donate_argnums=(1,) if donate else (),
    )

  # -- K selection -----------------------------------------------------------

  def _estimate_ms(self, batch: Data, probe: int) -> float:
    """Per-dispatch time estimate for a batch of `probe` envs, from the
    compiled executable's own flop count (rig-independent) divided by an
    achievable-rate prior (the rig-dependent knob)."""
    probe_batch = jax.tree.map(lambda x: x[:probe], batch)
    compiled = self._jit.lower(self.m, probe_batch).compile()
    try:
      cost = compiled.cost_analysis()
      if isinstance(cost, Sequence):  # older jax returns [dict]
        cost = cost[0]
      flops = float(cost.get("flops", 0.0))
    except Exception:  # noqa: BLE001 — backends without cost analysis
      return 0.0
    return flops / self._flop_rate * 1e3

  def resolve_chunks(self, batch: Data) -> int:
    """The K that will be used for this batch (resolving "auto")."""
    b = _leading_dim(batch)
    if self._chunks != "auto":
      k = int(self._chunks)
      if b % k != 0:
        raise ValueError(f"chunks={k} does not divide batch size {b}")
      return k
    divs = _divisors(b)
    probe = min(b, 256)
    ms_probe = self._estimate_ms(batch, probe)
    if ms_probe <= 0.0:
      return 1
    ms_full = ms_probe * (b / probe)
    k_needed = max(1, math.ceil(ms_full / self._target_ms))
    for k in divs:
      if k >= k_needed:
        return k
    return b

  # -- stepping --------------------------------------------------------------

  def split(self, batch: Data) -> list[Data]:
    b = _leading_dim(batch)
    k = self.resolve_chunks(batch)
    self._chunks = k  # pin the resolved K (auto runs the probe once)
    c = b // k
    return [
        jax.tree.map(lambda x, i=i: x[i * c:(i + 1) * c], batch)
        for i in range(k)
    ]

  def step_parts(self, parts: list[Data]) -> list[Data]:
    # each call is an independent async dispatch; XLA pipelines them
    return [self._jit(self.m, p) for p in parts]

  def join(self, parts: list[Data]) -> Data:
    if len(parts) == 1:
      return parts[0]
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)

  def __call__(self, batch: Any) -> Any:
    """One chunked step.  Accepts a stacked Data (split/step/join — fine
    for one-shot use) or a list of chunk parts (the rollout form, which
    skips the per-step split/join dispatches)."""
    if isinstance(batch, (list, tuple)):
      return self.step_parts(list(batch))
    return self.join(self.step_parts(self.split(batch)))


def chunked_step(
    m: Model,
    chunks: int | str = "auto",
    **kwargs,
) -> ChunkedStepper:
  """Builds a :class:`ChunkedStepper` for model ``m``.

  ``chunks="auto"`` sizes K from the compiled step's cost analysis so the
  estimated per-dispatch time stays under MJTPU_CHUNK_TARGET_MS; an int
  pins K (must divide the batch size).
  """
  return ChunkedStepper(m, chunks, **kwargs)
