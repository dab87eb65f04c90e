"""Roofline accounting: compiled FLOPs/bytes vs device peaks.

XLA's ``compiled.cost_analysis()`` reports the FLOPs and HBM bytes of one
dispatch rig-independently; combined with a measured steps/s this yields
achieved TFLOP/s / GB/s and %-of-peak (MFU / bandwidth-utilization) columns
for benchmark rows (reference README methodology :243-247 reports raw
steps/s only — the roofline columns are this build's addition, SURVEY.md §5
tracing/profiling).

Peak numbers are per-chip datasheet values for the dense-matmul unit (bf16)
and HBM bandwidth; keys match ``jax.devices()[0].device_kind``.
"""

from __future__ import annotations

from typing import Any, Sequence

# device_kind -> (peak FLOP/s bf16 MXU, peak HBM bytes/s)
PEAKS: dict[str, tuple[float, float]] = {
    "TPU v4": (275e12, 1228e9),
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
    "TPU v5": (459e12, 2765e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v6 lite": (918e12, 1640e9),
    "TPU v6e": (918e12, 1640e9),
}


def compiled_cost(compiled: Any) -> tuple[float | None, float | None]:
  """(flops, bytes accessed) of one dispatch, or (None, None) when the
  backend provides no cost analysis."""
  try:
    ca = compiled.cost_analysis()
    if isinstance(ca, Sequence):  # older jax returns [dict]
      ca = ca[0]
    flops = float(ca.get("flops", -1.0))
    bytes_ = float(ca.get("bytes accessed", -1.0))
  except Exception:  # noqa: BLE001 — backends without cost analysis
    return None, None
  return (flops if flops > 0 else None), (bytes_ if bytes_ > 0 else None)


def roofline(
    compiled: Any,
    steps_per_sec: float,
    dispatch_batch: int,
    device_kind: str | None = None,
) -> dict:
  """Roofline columns for a benchmark row.

  Args:
    compiled: the compiled batched step executable (one dispatch).
    steps_per_sec: measured env-steps/s (across all dispatches).
    dispatch_batch: envs per dispatch of `compiled` (the chunk size, not
      necessarily the total batch).
    device_kind: ``jax.devices()[0].device_kind``; inferred if None.

  Returns:
    dict with compiled_gflops / compiled_mbytes (per dispatch),
    achieved_tflops_per_sec / achieved_gbytes_per_sec, and — when the
    device's peaks are known — pct_peak_flops (MFU) / pct_peak_bw.
  """
  if device_kind is None:
    import jax

    device_kind = jax.devices()[0].device_kind
  flops, bytes_ = compiled_cost(compiled)
  if flops is None:
    return {}
  dispatches_per_sec = steps_per_sec / max(dispatch_batch, 1)
  row = {
      "compiled_gflops": round(flops / 1e9, 3),
      "achieved_tflops_per_sec": round(flops * dispatches_per_sec / 1e12, 2),
  }
  if bytes_ is not None:
    row["compiled_mbytes"] = round(bytes_ / 1e6, 3)
    row["achieved_gbytes_per_sec"] = round(
        bytes_ * dispatches_per_sec / 1e9, 2
    )
  peaks = PEAKS.get(device_kind)
  if peaks:
    row["pct_peak_flops"] = round(
        100.0 * flops * dispatches_per_sec / peaks[0], 1
    )
    # No pct_peak_bw column: XLA's "bytes accessed" counts every fused
    # op's operands (VMEM-resident reuse included), so it exceeds real
    # HBM traffic by orders of magnitude on fusion-heavy programs —
    # measured 500× peak HBM on the heavy humanoid, i.e. not a bandwidth
    # number at all.  compiled_mbytes stays as a rig-independent RELATIVE
    # metric (same-program A/Bs), not an absolute traffic figure.
  return row
