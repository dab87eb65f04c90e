"""Plot PPO learning curves from train_ppo --log-jsonl artifacts.

    python scripts/plot_learning.py benchmarks/learning/*.jsonl \
        -o benchmarks/learning/curves_r4.png

One panel per env, mean rollout reward vs environment steps (the e2e
learning evidence the reference gets from running its training examples in
CI, gpu-tests.yml:11-31).
"""

from __future__ import annotations

import argparse
import json
import pathlib

# single-series-per-panel palette (panel title carries identity; no legend)
SERIES = "#2a78d6"
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT_2 = "#52514e"
GRID = "#e5e4e0"


def load(path):
  rows = [json.loads(ln) for ln in pathlib.Path(path).read_text().splitlines()
          if ln.strip()]
  env = rows[0]["env"] if rows else pathlib.Path(path).stem
  stem = pathlib.Path(path).stem
  # disambiguate panels whose env name repeats (e.g. the lr~0 control run)
  if "control" in stem:
    env += " (lr~0 control)"
  return env, rows


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("paths", nargs="+")
  ap.add_argument("-o", "--out", default="learning_curves.png")
  args = ap.parse_args()

  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt

  runs = [load(p) for p in args.paths]
  fig, axes = plt.subplots(
      1, len(runs), figsize=(5.2 * len(runs), 3.6), facecolor=SURFACE
  )
  if len(runs) == 1:
    axes = [axes]
  for ax, (env, rows) in zip(axes, runs):
    steps = [r["env_steps"] / 1e6 for r in rows]
    # prefer episode return (the metric with headroom; r5) over the
    # near-ceiling per-step mean reward of older artifacts
    has_ep = any(r.get("episode_return") is not None for r in rows)
    if has_ep:
      pairs = [(s, r["episode_return"]) for s, r in zip(steps, rows)
               if r.get("episode_return") is not None]
      steps, rew = zip(*pairs)
      metric = "episode return"
    else:
      rew = [r["mean_reward"] for r in rows]
      metric = "mean rollout reward"
    ax.set_facecolor(SURFACE)
    ax.plot(steps, rew, color=SERIES, linewidth=2, solid_capstyle="round")
    ax.set_title(f"PPO on {env} — {metric}", color=TEXT,
                 fontsize=11, loc="left")
    ax.set_xlabel("env steps (millions)", color=TEXT_2, fontsize=9)
    ax.set_ylabel(metric, color=TEXT_2, fontsize=9)
    ax.grid(True, color=GRID, linewidth=0.7)
    ax.tick_params(colors=TEXT_2, labelsize=8)
    for spine in ax.spines.values():
      spine.set_visible(False)
  fig.tight_layout()
  fig.savefig(args.out, dpi=150, facecolor=SURFACE)
  print(f"wrote {args.out}")


if __name__ == "__main__":
  main()
