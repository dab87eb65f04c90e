"""Per-stage cost breakdown of the batched step on the live accelerator.

jax.profiler wedges the tunneled-TPU runtime (CLAUDE.md), so this measures
the pipeline the only way that works there: each stage is jitted+vmapped
separately and timed back-to-back on the same prepared batch, bracketed by
block_until_ready. Stage times do not sum exactly to the fused step time
(XLA fuses across stage boundaries and per-dispatch overhead multiplies),
but the *ranking* and rough proportions are what optimization targeting
needs.

    python scripts/stage_costs.py                       # humanoid_bench, B=65536
    MJTPU_BENCH_MODEL=ant_bench MJTPU_BENCH_BATCH=32768 python scripts/stage_costs.py
"""

from __future__ import annotations

import json
import os
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
from mjtpu._src import constraint, forward, sensor, smooth, solver
from mjtpu._src import collision_driver

ASSETS = Path(__file__).resolve().parent.parent / "mjtpu" / "zoo" / "assets"

MODEL = os.environ.get("MJTPU_BENCH_MODEL", "humanoid_bench")
BATCH = int(os.environ.get("MJTPU_BENCH_BATCH", "65536"))
STEPS = int(os.environ.get("MJTPU_BENCH_STEPS", "200"))

def build_stages(m):
  """(name, fn) in pipeline order, mirroring forward.fwd_* exactly —
  including the conditional stages (tendon_armature only when the model
  has one, forward.py fwd_position; solve skipped when count_constraints
  yields nefc == 0, forward.py forward)."""
  from mjtpu._src import support

  stages = [
      ("kinematics", smooth.kinematics),
      ("com_pos", smooth.com_pos),
      ("camlight", smooth.camlight),
      ("tendon", smooth.tendon),
      ("crb", smooth.crb),
  ]
  if m.has_tendon_armature:
    stages.append(("tendon_armature", smooth.tendon_armature))
  stages += [
      ("factor_m", smooth.factor_m),
      ("collision", collision_driver.collision),
      ("make_constraint", constraint.make_constraint),
      ("transmission", smooth.transmission),
      ("sensor_pos", sensor.sensor_pos),
      ("fwd_velocity", forward.fwd_velocity),
      ("sensor_vel", sensor.sensor_vel),
      ("fwd_actuation", forward.fwd_actuation),
      ("fwd_acceleration", forward.fwd_acceleration),
  ]
  if support.count_constraints(m)[3] > 0:
    stages.append(("solve", solver.solve))
  stages += [
      ("sensor_acc", sensor.sensor_acc),
      ("euler", forward.euler),
  ]
  return stages


def main():
  mjm = mujoco.MjModel.from_xml_path(str(ASSETS / f"{MODEL}.xml"))
  mjtpu.procedural_terrain(mjm)
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d0 = mjtpu.make_data(m)
  rng = np.random.default_rng(0)
  qpos = jnp.asarray(
      mjm.qpos0[None] + rng.uniform(-0.01, 0.01, (BATCH, mjm.nq)), jnp.float32
  )
  batch = jax.vmap(lambda q: d0.replace(qpos=q))(qpos)

  # settle: a few full steps so every Data field is realistic (contacts
  # active, warmstarts populated)
  step = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))
  for _ in range(3):
    batch = step(m, batch)
  jax.block_until_ready(batch)

  def timeit(fn, arg):
    out = fn(arg)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
      out = fn(arg)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / STEPS * 1e3  # ms per call

  # reference point: the fused full step
  full_ms = timeit(lambda b: step(m, b), batch)
  print(f"# full step: {full_ms:.4f} ms  ({BATCH/full_ms*1e3:,.0f} steps/s)",
        file=sys.stderr)

  rows = []
  d_cur = batch
  for name, fn in build_stages(m):
    f = jax.jit(jax.vmap(lambda dd, fn=fn: fn(m, dd)))
    try:
      ms = timeit(f, d_cur)
      d_cur = f(d_cur)  # feed each stage the previous stage's output
      rows.append({"stage": name, "ms": round(ms, 4),
                   "pct_of_step": round(100 * ms / full_ms, 1)})
      print(f"# {name:18s} {ms:8.4f} ms  {100*ms/full_ms:5.1f}%",
            file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — report the failure, then stop:
      # d_cur was not advanced, so timing later stages would silently
      # measure them on the wrong (previous stage's) input
      rows.append({"stage": name, "error": str(e)[:120]})
      print(f"# {name:18s} ERROR {e} — aborting remaining stages "
            f"(stale input)", file=sys.stderr)
      break

  print(json.dumps({
      "model": MODEL, "batch": BATCH,
      "full_step_ms": round(full_ms, 4),
      "sum_stage_ms": round(sum(r.get("ms", 0.0) for r in rows), 4),
      "stages": rows,
  }))


if __name__ == "__main__":
  main()
