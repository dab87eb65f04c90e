"""Benchmark driver: humanoid env-steps/sec on the local accelerator.

Methodology mirrors the reference's README benchmarks (1000 timed steps
after warmup, block_until_ready bracketing, steps/s = B*nsteps/elapsed —
reference README.md:243-262).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: MJX humanoid at B=4096 on H200 = 2,197,238 steps/s (BASELINE.md).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: subsequent bench runs skip the multi-minute
# XLA compile (the reference's #1 pain point was 40-min tuned compiles)
jax.config.update("jax_compilation_cache_dir", "/tmp/mjtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

BASELINE_STEPS_PER_SEC = 2_197_238.0  # MJX humanoid B=4096 (BASELINE.md)


def fill_hfields(mjm):
  """Deterministic procedural terrain (alias of mjtpu.procedural_terrain,
  kept for the tests that import it from here)."""
  import mjtpu

  mjtpu.procedural_terrain(mjm)


def main():
  batch = int(os.environ.get("MJTPU_BENCH_BATCH", "4096"))
  nsteps = int(os.environ.get("MJTPU_BENCH_STEPS", "1000"))
  nwarm = int(os.environ.get("MJTPU_BENCH_WARMUP", "100"))
  model_name = os.environ.get("MJTPU_BENCH_MODEL", "humanoid")

  import mujoco

  import mjtpu

  mjm = mujoco.MjModel.from_xml_path(
      os.path.join(os.path.dirname(__file__), "mjtpu", "zoo", "assets",
                   f"{model_name}.xml")
  )
  fill_hfields(mjm)
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d0 = mjtpu.make_data(m)

  rng = np.random.default_rng(0)
  qpos = jnp.asarray(
      mjm.qpos0[None] + rng.uniform(-0.01, 0.01, (batch, mjm.nq)),
      dtype=jnp.float32,
  )
  batch_d = jax.vmap(lambda q: d0.replace(qpos=q))(qpos)

  # solver iteration count is data-dependent (lax.while_loop); for batched
  # throughput the loop runs to the slowest env, exactly like the reference
  vstep = jax.vmap(mjtpu.step, in_axes=(None, 0))

  # direct per-step dispatch: XLA pipelines the async dispatches, and the
  # tunneled TPU runtime degrades badly on long fori_loop-wrapped rollouts
  step_fn = jax.jit(vstep)

  def run(d, n):
    for _ in range(n):
      d = step_fn(m, d)
    jax.block_until_ready(d.qpos)
    return d

  # warmup (compile + cache)
  t0 = time.perf_counter()
  batch_d = run(batch_d, nwarm)
  compile_s = time.perf_counter() - t0

  t0 = time.perf_counter()
  batch_d = run(batch_d, nsteps)
  elapsed = time.perf_counter() - t0

  steps_per_sec = batch * nsteps / elapsed
  qpos = np.asarray(batch_d.qpos)
  finite_frac = float(np.isfinite(qpos).all(axis=1).mean())
  assert finite_frac > 0.95, f"only {finite_frac:.1%} envs finite after rollout"
  result = {
      "metric": f"{model_name}_env_steps_per_sec_B{batch}",
      "value": round(steps_per_sec, 1),
      "unit": "env-steps/s",
      "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 4),
  }
  print(json.dumps(result))
  print(
      f"# device={jax.devices()[0].device_kind} batch={batch} "
      f"steps={nsteps} elapsed={elapsed:.2f}s compile+warmup={compile_s:.1f}s",
      file=sys.stderr,
  )


if __name__ == "__main__":
  main()
