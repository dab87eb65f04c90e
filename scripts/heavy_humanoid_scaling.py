"""Heavy zoo-humanoid batch scaling with dispatch chunking.

r3 finding (PERFORMANCE.md batch-scaling): the heavy humanoid (full
candidate set, run-to-tolerance solver) turned over at B=16-32k because a
single dispatch crosses the tunneled runtime's ~1.7 ms degradation
threshold.  mjtpu.parallel.chunked_step splits the batch into K pipelined
dispatches; this probe records the B x K surface so the batch-scaling
section can quote chunked numbers instead of "turns over".

Each (B, K) cell runs bench.py in a subprocess (its health-check/retry/
deadline harness, donation, and roofline columns come for free) and tags
the JSON row into benchmarks/results_r5.jsonl.

Run on the TPU (leave PYTHONPATH alone):
  python scripts/heavy_humanoid_scaling.py
"""

import json
import os
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CELLS = [
    # (batch, chunks)
    (16384, 1),
    (32768, 1),
    (32768, 4),
    (65536, 1),
    (65536, 8),
    (131072, 16),
]


def _actual_batch(row):
  """Batch the row was actually measured at: bench.py's fallback ladder can
  silently change it (last resort forces B=1024), so trust the metric name,
  not the requested cell."""
  metric = row.get("metric", "")
  m = re.search(r"_B(\d+)$", metric)
  return int(m.group(1)) if m else None


def main():
  out = os.path.join(_REPO, "benchmarks", "results_r5.jsonl")
  for batch, chunks in CELLS:
    env = dict(
        os.environ,
        MJTPU_BENCH_MODEL="humanoid",
        MJTPU_BENCH_BATCH=str(batch),
        MJTPU_BENCH_CHUNKS=str(chunks),
        MJTPU_BENCH_STEPS="400",
        MJTPU_BENCH_BUDGET="420",
    )
    tag = f"humanoid_heavy/B{batch}/K{chunks}"
    print(f"# cell: {tag}", file=sys.stderr, flush=True)
    try:
      proc = subprocess.run(
          [sys.executable, os.path.join(_REPO, "bench.py")],
          env=env, cwd=_REPO, capture_output=True, text=True, timeout=480)
    except subprocess.TimeoutExpired:
      row = {"tag": tag, "steps_per_sec": None, "note": "cell timeout (480s)"}
      print(json.dumps(row), flush=True)
      with open(out, "a") as f:
        f.write(json.dumps(row) + "\n")
      continue
    sys.stderr.write(proc.stderr[-1500:] if proc.stderr else "")
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if lines:
      row = json.loads(lines[-1])
      actual = _actual_batch(row)
      if actual is not None and actual != batch:
        tag = f"humanoid_heavy/B{actual}/K{chunks}_fallback_from_B{batch}"
      row["tag"] = tag
      print(json.dumps(row), flush=True)
      with open(out, "a") as f:
        f.write(json.dumps(row) + "\n")
    else:
      row = {"tag": tag, "steps_per_sec": None,
             "note": f"bench failed rc={proc.returncode}"}
      print(json.dumps(row), flush=True)
      with open(out, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
  main()
