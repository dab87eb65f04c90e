#!/usr/bin/env python3
"""Produce demo videos of both satellite CMG environments.

A sinusoidal gimbal-rate policy drives visible tumbling so the gyroscopic
coupling between CMG gimbals and satellite attitude is clearly visible.
Frames come from mjtpu's pure-tensor renderer, so the whole rollout — physics
and pixels — runs on the accelerator. (Reference capability map:
examples/satellite_video.py, which rendered with the MuJoCo C renderer.)

Run from the repo root:
    python examples/satellite_video.py [--steps 300] [--size 256]
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import imageio
import jax
import jax.numpy as jnp
import numpy as np


from mjtpu.zoo import ENVS


def record(env_name: str, out: Path, steps: int, size: int, fps: int = 25):
  # pixel_obs injects an observer camera when the asset has none (the
  # satellite asset is camera-less) and renders through the env pipeline
  env = ENVS[env_name](pixel_obs=True, pixel_size=(size, size))
  state = env.reset(jax.random.PRNGKey(0))

  step = jax.jit(env.step)

  nu = env.action_size
  phases = jnp.arange(nu) * (2 * math.pi / nu)
  frames = []
  for t in range(steps):
    action = 0.8 * jnp.sin(0.05 * t + phases)     # sinusoidal gimbal rates
    state = step(state, action)
    img = np.asarray(state.pixels)
    frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
  try:
    imageio.mimsave(out, frames, fps=fps)
    print(f"{env_name}: wrote {len(frames)} frames -> {out}")
  except (ValueError, ImportError):
    # no mp4 backend (imageio without ffmpeg/pyav): fall back to a frame
    # stack that `imageio.mimsave` or any viewer can convert later
    alt = out.with_suffix(".npz")
    np.savez_compressed(alt, frames=np.stack(frames), fps=fps)
    print(f"{env_name}: no mp4 backend; wrote {len(frames)} frames -> {alt}")


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--steps", type=int, default=300)
  ap.add_argument("--size", type=int, default=256)
  ap.add_argument("--out-dir", default="/tmp/mjtpu_videos")
  args = ap.parse_args()

  out_dir = Path(args.out_dir)
  out_dir.mkdir(parents=True, exist_ok=True)
  for name in ("satellite_small", "satellite_large"):
    record(name, out_dir / f"{name}.mp4", args.steps, args.size)


if __name__ == "__main__":
  main()
