#!/usr/bin/env python3
"""Benchmark throughput at different harness levels to find the bottleneck.

Compares, for one env at one batch size:
  1. raw jit(vmap(step))            — the README benchmark number
  2. env.step jit(vmap)             — physics + reward/obs/auto-reset
  3. full collection loop           — env.step + host transfer of obs/reward

(Reference capability map: examples/bench_throughput.py, which compared
vmap / compile(vmap) / env._step / TorchRL-collector levels.)

Run from the repo root:
    python examples/bench_throughput.py [--env humanoid] [--batch 4096]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import mjtpu
from mjtpu.zoo import ENVS


def timed(label, fn, n, total_env_steps):
  fn()  # compile + warmup
  fn()
  t0 = time.perf_counter()
  for _ in range(n):
    fn()
  dt = (time.perf_counter() - t0) / n
  print(f"{label:<34} {total_env_steps / dt:>14,.0f} env-steps/s "
        f"({dt * 1e3:8.2f} ms/iter)")


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--env", default="humanoid")
  ap.add_argument("--batch", type=int, default=4096)
  ap.add_argument("--iters", type=int, default=20)
  args = ap.parse_args()

  env = ENVS[args.env]()
  b, skip = args.batch, env.frame_skip
  keys = jax.random.split(jax.random.PRNGKey(0), b)
  state = jax.jit(jax.vmap(env.reset))(keys)
  actions = jnp.zeros((b, env.action_size), state.obs.dtype)
  print(f"env={args.env}  B={b}  frame_skip={skip}  "
        f"device={jax.devices()[0].device_kind}")

  # 1. raw physics
  m = env.model
  dx = state.data
  raw_step = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))
  raw_step(m, dx)

  def raw():
    nonlocal dx
    dx = raw_step(m, dx)
    jax.block_until_ready(dx.qpos)

  timed("raw jit(vmap(step))", raw, args.iters, b)

  # 2. env.step (physics x frame_skip + reward/obs/auto-reset)
  env_step = jax.jit(jax.vmap(env.step, in_axes=(0, 0)))
  s = state

  def estep():
    nonlocal s
    s = env_step(s, actions)
    jax.block_until_ready(s.obs)

  timed(f"env.step jit(vmap)  (x{skip} skip)", estep, args.iters, b * skip)

  # 3. collection loop (env.step + host transfer, what a trainer consumes)
  s2 = state

  def collect():
    nonlocal s2
    s2 = env_step(s2, actions)
    np.asarray(s2.obs), np.asarray(s2.reward), np.asarray(s2.done)

  timed("collection (env.step + to-host)", collect, args.iters, b * skip)


if __name__ == "__main__":
  main()
