"""Plot benchmark JSONL results (reference benchmarks/plot_bench.py +
examples/bench_all_to_plot.py: throughput-vs-batch curves per model).

    python benchmarks/plot_bench.py benchmarks/results_r1.jsonl -o bench.png
"""

from __future__ import annotations

import argparse
import collections
import json
import pathlib


def load(path):
  rows = []
  for line in pathlib.Path(path).read_text().splitlines():
    line = line.strip()
    if line:
      rows.append(json.loads(line))
  return rows


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("jsonl", nargs="?", default="benchmarks/results_r1.jsonl")
  ap.add_argument("-o", "--out", default="bench.png")
  args = ap.parse_args()

  rows = load(args.jsonl)
  by_model = collections.defaultdict(list)
  for r in rows:
    by_model[r["model"]].append((r["batch"], r["steps_per_sec"]))

  import matplotlib

  matplotlib.use("Agg")
  import matplotlib.pyplot as plt

  fig, ax = plt.subplots(figsize=(7, 4.5))
  for model, pts in sorted(by_model.items()):
    pts.sort()
    ax.plot([p[0] for p in pts], [p[1] for p in pts], "o-", label=model)
  ax.set_xscale("log", base=2)
  ax.set_yscale("log")
  ax.set_xlabel("env batch size")
  ax.set_ylabel("env-steps / s")
  ax.set_title(f"mjtpu throughput ({rows[0].get('device', '?')})")
  ax.grid(True, which="both", alpha=0.3)
  ax.legend()
  fig.tight_layout()
  fig.savefig(args.out, dpi=120)
  print(f"wrote {args.out} ({len(rows)} rows, {len(by_model)} models)")


if __name__ == "__main__":
  main()
