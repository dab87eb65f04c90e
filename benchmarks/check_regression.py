#!/usr/bin/env python3
"""Compare a bench_all JSONL sweep against a committed baseline sweep.

Fails (exit 1) if any (model, batch) config regressed by more than
--threshold relative to the baseline's steps_per_sec. (Capability map: the
reference's benchmarks.yml github-action-benchmark alert at 130%.)

Usage:
    python benchmarks/check_regression.py --baseline benchmarks/results_r1.jsonl \
        --current /tmp/bench_nightly.jsonl --threshold 0.30
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict[tuple, float]:
  rows = {}
  with open(path) as f:
    for line in f:
      line = line.strip()
      if not line:
        continue
      r = json.loads(line)
      if "steps_per_sec" in r:
        rows[(r["model"], r["batch"])] = r["steps_per_sec"]
  return rows


def main() -> int:
  ap = argparse.ArgumentParser()
  ap.add_argument("--baseline", required=True)
  ap.add_argument("--current", required=True)
  ap.add_argument("--threshold", type=float, default=0.30,
                  help="max allowed fractional regression")
  ap.add_argument("--allow-missing", action="store_true",
                  help="do not fail when a baseline config is absent from "
                       "the current run (default: missing == failure, so "
                       "coverage loss can't mask a regression)")
  args = ap.parse_args()

  base, cur = load(args.baseline), load(args.current)
  failed = False
  for key in sorted(base):
    if key not in cur:
      print(f"MISSING  {key}: not in current run"
            + ("" if args.allow_missing else "  << FAILURE"))
      failed = failed or not args.allow_missing
      continue
    ratio = cur[key] / base[key]
    flag = ""
    if ratio < 1.0 - args.threshold:
      flag = "  << REGRESSION"
      failed = True
    print(f"{key[0]:>12} B={key[1]:<6} {base[key]:>14,.0f} -> "
          f"{cur[key]:>14,.0f}  ({ratio:5.2f}x){flag}")
  return 1 if failed else 0


if __name__ == "__main__":
  sys.exit(main())
