#!/usr/bin/env python3
"""Single-step latency benchmark: blocking p50/p99 per step.

BASELINE.json's headline metric includes "single-step p50 latency"; the
throughput harness (bench_all.py) pipelines async dispatches and cannot
measure it. This one blocks on every step.

Run on TPU (quiet host): python benchmarks/bench_latency.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mjtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import mjtpu


def measure(model_name: str, batch: int, iters: int, warmup: int = 30):
  xml = Path(mjtpu.__file__).parent / "zoo" / "assets" / f"{model_name}.xml"
  mjm = mujoco.MjModel.from_xml_string(xml.read_text())
  mjtpu.procedural_terrain(mjm)  # fill hfields (terrain assets ship flat)
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d0 = mjtpu.make_data(m)
  rng = np.random.default_rng(0)
  qpos = jnp.asarray(
      mjm.qpos0[None] + rng.uniform(-0.01, 0.01, (batch, mjm.nq)), jnp.float32
  )
  d = jax.vmap(lambda q: d0.replace(qpos=q))(qpos)
  step = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))

  for _ in range(warmup):
    d = step(m, d)
  jax.block_until_ready(d.qpos)

  lat = np.empty(iters)
  for i in range(iters):
    t0 = time.perf_counter()
    d = step(m, d)
    jax.block_until_ready(d.qpos)
    lat[i] = time.perf_counter() - t0
  return {
      "model": model_name,
      "batch": batch,
      "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 4),
      "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 4),
      "mean_ms": round(float(lat.mean()) * 1e3, 4),
      "device": jax.devices()[0].device_kind,
  }


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--models", nargs="+", default=["humanoid", "ant"])
  ap.add_argument("--batches", nargs="+", type=int, default=[1, 4096])
  ap.add_argument("--iters", type=int, default=200)
  ap.add_argument("--out", default="")
  args = ap.parse_args()

  rows = []
  for model in args.models:
    for batch in args.batches:
      r = measure(model, batch, args.iters)
      rows.append(r)
      print(json.dumps(r))
  if args.out:
    with open(args.out, "a") as f:
      for r in rows:
        f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
  main()
