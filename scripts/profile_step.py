#!/usr/bin/env python3
"""Capture a jax.profiler trace of the batched step for TensorBoard/Perfetto.

(Capability map: the reference's tracing story — SURVEY.md §5 — is Inductor
kernel dumps + Dynamo counters; the XLA-era equivalents are this profiler
trace plus scripts/dump_hlo.py.)

Usage (TPU, repo root, quiet host):
    python scripts/profile_step.py --model humanoid --batch 4096 --steps 50
    tensorboard --logdir /tmp/mjtpu_trace   # or open in Perfetto
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import mujoco

import mjtpu


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--model", default="humanoid")
  ap.add_argument("--batch", type=int, default=4096)
  ap.add_argument("--steps", type=int, default=50)
  ap.add_argument("--out", default="/tmp/mjtpu_trace")
  args = ap.parse_args()

  xml = Path(mjtpu.__file__).parent / "zoo" / "assets" / f"{args.model}.xml"
  mjm = mujoco.MjModel.from_xml_string(xml.read_text())
  mjtpu.procedural_terrain(mjm)
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d = mjtpu.make_data(m)
  key = jax.random.PRNGKey(0)
  qpos = m.qpos0 + 0.01 * jax.random.normal(key, (args.batch, m.nq), jnp.float32)
  dx = jax.vmap(lambda q: d.replace(qpos=q))(qpos)
  step = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))

  dx = step(m, dx)  # compile outside the trace
  jax.block_until_ready(dx.qpos)

  with jax.profiler.trace(args.out):
    t0 = time.perf_counter()
    for _ in range(args.steps):
      dx = step(m, dx)
    jax.block_until_ready(dx.qpos)
    dt = time.perf_counter() - t0
  print(f"trace -> {args.out}  ({args.steps} steps, "
        f"{args.batch * args.steps / dt:,.0f} env-steps/s)")


if __name__ == "__main__":
  main()
