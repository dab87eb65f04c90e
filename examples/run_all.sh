#!/usr/bin/env bash
# Smoke-run every runnable example (headless-safe subset) sequentially.
# The TPU admits one process at a time, so examples must not run in parallel.
#
# Usage (from the repo root):  bash examples/run_all.sh [quick]
set -u -o pipefail
cd "$(dirname "$0")/.."

QUICK="${1:-}"
if [ "$QUICK" = "quick" ]; then
  STEPS=50; BATCHES="64"; NSTEPS=50; THROUGHPUT_B=256
else
  STEPS=300; BATCHES="64 512 4096"; NSTEPS=200; THROUGHPUT_B=1024
fi

run() {
  echo "=== $* ==="
  if ! "$@"; then echo "FAILED: $*" >&2; FAILED=1; fi
}

FAILED=0
run python examples/e2e_comparison.py --nsteps "$NSTEPS"
run python examples/batched_comparison.py --nsteps "$NSTEPS" --batches $BATCHES
run python examples/gymnasium_example.py
# quick tier uses a smaller batch: on the tunneled test TPU, chaining a
# fresh reset-program compile with a B=1024 dispatch in one process can
# abort the runtime (r5; the engine step itself runs 0.43 ms/dispatch at
# B=1024 — this is a rig compile-infra flake, see CLAUDE.md)
run python examples/bench_throughput.py --batch "$THROUGHPUT_B" --iters 5
run python examples/policy_viewer_example.py --headless --steps "$STEPS"
run python examples/satellite_video.py --steps "$STEPS" --size 128
run python examples/train_ppo.py --num-envs 64 --rollout 8 --iters 2
run python examples/train_sac.py --num-envs 32 --iters 5
run python examples/diff_optim.py --iters 20 --steps 60 --target 0.8 0.4
exit $FAILED
