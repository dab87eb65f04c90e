#!/usr/bin/env python3
"""Batched simulation comparison: MuJoCo C (sequential) vs mjtpu jit(vmap).

Runs B independent simulations for N steps each:
  - MuJoCo C: sequential python loop over the batch (no parallelism)
  - mjtpu: jit(vmap(step)) — one fused batched kernel per step

(Reference capability map: examples/batched_comparison.py.)

Run from the repo root:
    python examples/batched_comparison.py [--model humanoid] [--batches 64 512]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import mujoco
import numpy as np

import mjtpu


def bench_mujoco_c(mjm, batch, nsteps):
  mjd = mujoco.MjData(mjm)
  # time one env's trajectory and extrapolate: the C loop is embarrassingly
  # sequential, so steps/s is batch-independent
  probe = min(nsteps, 200)
  t0 = time.perf_counter()
  for _ in range(probe):
    mujoco.mj_step(mjm, mjd)
  per_step = (time.perf_counter() - t0) / probe
  return batch * nsteps * per_step


def bench_mjtpu(m, batch, nsteps, seed=0):
  d = mjtpu.make_data(m)
  key = jax.random.PRNGKey(seed)
  qpos = m.qpos0 + 0.01 * jax.random.normal(key, (batch, m.nq), d.qpos.dtype)
  dx = jax.vmap(lambda q: d.replace(qpos=q))(qpos)
  step = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))
  t0 = time.perf_counter()
  dx = step(m, dx)
  jax.block_until_ready(dx.qpos)
  compile_s = time.perf_counter() - t0
  for _ in range(10):
    dx = step(m, dx)
  jax.block_until_ready(dx.qpos)
  t0 = time.perf_counter()
  for _ in range(nsteps):
    dx = step(m, dx)
  jax.block_until_ready(dx.qpos)
  return time.perf_counter() - t0, compile_s


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--model", default="humanoid")
  ap.add_argument("--nsteps", type=int, default=200)
  ap.add_argument("--batches", type=int, nargs="+", default=[64, 512, 4096])
  args = ap.parse_args()

  xml = Path(mjtpu.__file__).parent / "zoo" / "assets" / f"{args.model}.xml"
  mjm = mujoco.MjModel.from_xml_string(xml.read_text())
  m = mjtpu.put_model(mjm)
  dev = jax.devices()[0].device_kind

  print(f"model={args.model}  nsteps={args.nsteps}  device={dev}")
  print(f"{'B':>6} | {'MuJoCo C seq (est)':>20} | {'mjtpu jit(vmap)':>18} | speedup")
  for b in args.batches:
    t_c = bench_mujoco_c(mjm, b, args.nsteps)
    t_j, compile_s = bench_mjtpu(m, b, args.nsteps)
    sps_c = b * args.nsteps / t_c
    sps_j = b * args.nsteps / t_j
    print(f"{b:>6} | {sps_c:>14,.0f} st/s | {sps_j:>12,.0f} st/s | "
          f"{sps_j / sps_c:6.1f}×  (compile {compile_s:.1f}s)")


if __name__ == "__main__":
  main()
