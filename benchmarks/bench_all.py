"""Multi-config benchmark sweep (reference examples/bench_all.py: JSONL of
compile_s / warmup / steady-state throughput per model x batch).

    python benchmarks/bench_all.py --models humanoid ant halfcheetah \
        --batches 1024 4096 8192 --out bench_results.jsonl

Head-to-head comparators (reference benchmarks/bench_mujoco_c.py and
bench_mjx.py) run in the same harness so the README comparison table is
regenerable from one command:

    python benchmarks/bench_all.py --engines mjtpu mjc mjx

`mjc` is sequential MuJoCo C at B=1 (the reference's CPU baseline row);
`mjx` is jit(vmap(mjx.step)) at the same batches, and is skipped with a
notice when mujoco.mjx is not installed in the image.
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

ASSETS = Path(__file__).resolve().parent.parent / "mjtpu" / "zoo" / "assets"


def bench_one(model_name: str, batch: int, nsteps: int, nwarm: int) -> dict:
  mjm = mujoco.MjModel.from_xml_path(str(ASSETS / f"{model_name}.xml"))
  mjtpu.procedural_terrain(mjm)
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d0 = mjtpu.make_data(m)
  rng = np.random.default_rng(0)
  qpos = jnp.asarray(
      mjm.qpos0[None] + rng.uniform(-0.01, 0.01, (batch, mjm.nq)), jnp.float32
  )
  batch_d = jax.vmap(lambda q: d0.replace(qpos=q))(qpos)
  step = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))

  t0 = time.perf_counter()
  batch_d = step(m, batch_d)
  jax.block_until_ready(batch_d.qpos)
  compile_s = time.perf_counter() - t0

  for _ in range(nwarm):
    batch_d = step(m, batch_d)
  jax.block_until_ready(batch_d.qpos)

  t0 = time.perf_counter()
  for _ in range(nsteps):
    batch_d = step(m, batch_d)
  jax.block_until_ready(batch_d.qpos)
  elapsed = time.perf_counter() - t0

  steps_per_sec = batch * nsteps / elapsed
  row = {
      "model": model_name,
      "batch": batch,
      "nsteps": nsteps,
      "compile_s": round(compile_s, 2),
      "steps_per_sec": round(steps_per_sec, 1),
      "ms_per_batched_step": round(elapsed / nsteps * 1e3, 4),
      "device": jax.devices()[0].device_kind,
  }
  # roofline columns (MFU / bandwidth %-of-peak) from the compiled step
  from mjtpu import perf

  try:
    compiled = step.lower(m, batch_d).compile()  # cache hit: already built
    row.update(perf.roofline(compiled, steps_per_sec, batch))
  except Exception:  # noqa: BLE001 — keep the sweep alive without roofline
    pass
  return row


def bench_mujoco_c(model_name: str, nsteps: int) -> dict:
  """Sequential MuJoCo C at B=1 (reference benchmarks/bench_mujoco_c.py)."""
  mjm = mujoco.MjModel.from_xml_path(str(ASSETS / f"{model_name}.xml"))
  mjtpu.procedural_terrain(mjm)
  mjd = mujoco.MjData(mjm)
  for _ in range(100):  # warmup: settle + page in
    mujoco.mj_step(mjm, mjd)
  t0 = time.perf_counter()
  for _ in range(nsteps):
    mujoco.mj_step(mjm, mjd)
  elapsed = time.perf_counter() - t0
  return {
      "engine": "mujoco_c",
      "model": model_name,
      "batch": 1,
      "nsteps": nsteps,
      "steps_per_sec": round(nsteps / elapsed, 1),
      "device": "cpu-sequential",
  }


def bench_mjx(model_name: str, batch: int, nsteps: int, nwarm: int) -> dict:
  """MJX jit(vmap(step)) head-to-head row (reference benchmarks/bench_mjx.py).
  Returns a notice row when mujoco.mjx is not in the image."""
  try:
    from mujoco import mjx
  except ImportError:
    return {
        "engine": "mjx",
        "model": model_name,
        "batch": batch,
        "skipped": "mujoco.mjx not installed",
    }
  mjm = mujoco.MjModel.from_xml_path(str(ASSETS / f"{model_name}.xml"))
  mjtpu.procedural_terrain(mjm)
  mx = mjx.put_model(mjm)
  dx = mjx.make_data(mx)
  rng = np.random.default_rng(0)
  qpos = jnp.asarray(
      mjm.qpos0[None] + rng.uniform(-0.01, 0.01, (batch, mjm.nq)), jnp.float32
  )
  batch_d = jax.vmap(lambda q: dx.replace(qpos=q))(qpos)
  step = jax.jit(jax.vmap(mjx.step, in_axes=(None, 0)))
  t0 = time.perf_counter()
  batch_d = step(mx, batch_d)
  jax.block_until_ready(batch_d.qpos)
  compile_s = time.perf_counter() - t0
  for _ in range(nwarm):
    batch_d = step(mx, batch_d)
  jax.block_until_ready(batch_d.qpos)
  t0 = time.perf_counter()
  for _ in range(nsteps):
    batch_d = step(mx, batch_d)
  jax.block_until_ready(batch_d.qpos)
  elapsed = time.perf_counter() - t0
  return {
      "engine": "mjx",
      "model": model_name,
      "batch": batch,
      "nsteps": nsteps,
      "compile_s": round(compile_s, 2),
      "steps_per_sec": round(batch * nsteps / elapsed, 1),
      "device": jax.devices()[0].device_kind,
  }


def _isolated_sweep(args):
  """One fresh subprocess per (engine, model, batch) cell — the r4
  measurement-integrity protocol (CLAUDE.md): no cell can inherit another's
  degraded dispatch state, and a wedged cell only loses itself.  Timed-out
  or crashed cells get an explicit note row instead of silence."""
  import subprocess

  here = str(Path(__file__).resolve())
  cells = []
  for name in args.models:
    if "mjc" in args.engines:
      cells.append(("mjc", name, None))
    for b in args.batches:
      for eng in args.engines:
        if eng != "mjc":
          cells.append((eng, name, b))
  for eng, name, b in cells:
    cmd = [sys.executable, here, "--models", name, "--engines", eng,
           "--steps", str(args.steps), "--warmup", str(args.warmup)]
    if b is not None:
      cmd += ["--batches", str(b)]
    if args.out:
      cmd += ["--out", args.out]
    tag = f"{eng}/{name}" + (f"/B{b}" if b else "")
    print(f"# cell: {tag}", file=sys.stderr, flush=True)
    try:
      proc = subprocess.run(cmd, timeout=args.cell_timeout, text=True,
                            capture_output=True)
      sys.stderr.write(proc.stderr[-1000:] if proc.stderr else "")
      sys.stdout.write(proc.stdout)
      sys.stdout.flush()
      note = None if proc.returncode == 0 else f"cell rc={proc.returncode}"
    except subprocess.TimeoutExpired:
      note = f"cell timeout ({args.cell_timeout:.0f}s)"
    if note and args.out:
      row = {"engine": eng, "model": name, "batch": b, "note": note}
      with open(args.out, "a") as f:
        f.write(json.dumps(row) + "\n")
      print(json.dumps(row), flush=True)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--models", nargs="+",
                  default=["humanoid_bench", "ant_bench", "halfcheetah",
                           "hopper_bench", "walker2d"])
  ap.add_argument("--batches", nargs="+", type=int,
                  default=[4096, 32768, 131072])
  ap.add_argument("--steps", type=int, default=500)
  ap.add_argument("--warmup", type=int, default=50)
  ap.add_argument("--engines", nargs="+", default=["mjtpu"],
                  choices=["mjtpu", "mjc", "mjx"])
  ap.add_argument("--isolate", action="store_true",
                  help="run each (engine, model, batch) cell in a fresh "
                       "subprocess (measurement-integrity protocol)")
  ap.add_argument("--cell-timeout", type=float, default=420.0,
                  help="per-cell wall-clock bound in --isolate mode")
  ap.add_argument("--out", default="")
  args = ap.parse_args()

  if args.isolate:
    _isolated_sweep(args)
    return

  results = []
  for name in args.models:
    if "mjc" in args.engines:
      r = bench_mujoco_c(name, args.steps)
      results.append(r)
      print(json.dumps(r), flush=True)
    for b in args.batches:
      if "mjtpu" in args.engines:
        r = dict(engine="mjtpu", **bench_one(name, b, args.steps, args.warmup))
        results.append(r)
        print(json.dumps(r), flush=True)
      if "mjx" in args.engines:
        r = bench_mjx(name, b, args.steps, args.warmup)
        results.append(r)
        print(json.dumps(r), flush=True)
  if args.out:
    with open(args.out, "a") as f:
      for r in results:
        f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
  main()
