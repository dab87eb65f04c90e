#!/usr/bin/env python3
"""Domain randomization end-to-end: per-env physics in one compiled kernel.

Samples per-env friction / actuator-gain / body-mass scales, builds the
batched Model with ``mjtpu.parallel.randomize``, and A/Bs throughput against
the replicated-Model step — the marginal cost of giving every env its own
physics. (Capability-plus vs the reference, which can only batch Data;
this is the MJX-style randomization workflow, TPU-native.)

Run from the repo root (TPU if available, CPU otherwise):
    python examples/domain_randomization.py [--model humanoid_bench]
        [--batch 8192] [--steps 200]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mjtpu
from mjtpu import parallel

ASSETS = Path(__file__).resolve().parent.parent / "mjtpu" / "zoo" / "assets"


def sample_updates(mjm, key, batch):
  """Per-env physics: +-30% friction, +-20% gain, +-20% mass."""
  kf, kg, km = jax.random.split(key, 3)
  fric = jnp.asarray(np.array(mjm.geom_friction))
  gain = jnp.asarray(np.array(mjm.actuator_gainprm))
  mass = jnp.asarray(np.array(mjm.body_mass))
  f_s = jax.random.uniform(kf, (batch, mjm.ngeom, 1), minval=0.7, maxval=1.3)
  g_s = jax.random.uniform(kg, (batch, mjm.nu, 1), minval=0.8, maxval=1.2)
  m_s = jax.random.uniform(km, (batch, mjm.nbody), minval=0.8, maxval=1.2)
  updates = {
      "geom_friction": fric * f_s,
      "body_mass": mass * m_s,
  }
  if mjm.nu:
    updates["actuator_gainprm"] = gain * g_s
  return updates


def rollout(step_fn, batch, steps):
  """Dispatch steps individually (XLA pipelines the async dispatches)."""
  for _ in range(steps):
    batch = step_fn(batch)
  jax.block_until_ready(batch.qpos)
  return batch


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--model", default="humanoid_bench")
  ap.add_argument("--batch", type=int, default=8192)
  ap.add_argument("--steps", type=int, default=200)
  ap.add_argument("--warmup", type=int, default=20)
  args = ap.parse_args()

  mjm = mujoco.MjModel.from_xml_path(str(ASSETS / f"{args.model}.xml"))
  m = mjtpu.put_model(mjm)
  d0 = mjtpu.make_data(m)
  B = args.batch
  batch = jax.vmap(lambda _: d0)(jnp.arange(B))

  updates = sample_updates(mjm, jax.random.PRNGKey(0), B)
  dr_step, mb = parallel.randomized_step(m, updates)
  rep_step = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)))

  results = {}
  for label, fn in (
      ("replicated", lambda b: rep_step(m, b)),
      ("randomized", dr_step),
  ):
    rollout(fn, batch, args.warmup)
    t0 = time.perf_counter()
    out = rollout(fn, batch, args.steps)
    dt = time.perf_counter() - t0
    sps = B * args.steps / dt
    results[label] = sps
    alive = float(jnp.isfinite(out.qpos).all())
    print(f"{label:<12} {sps:>14,.0f} env-steps/s   finite={bool(alive)}")

  overhead = results["replicated"] / results["randomized"] - 1
  print(f"randomization overhead: {overhead:+.1%}")

  # the randomized physics must actually diverge the fleet
  out = rollout(dr_step, batch, 50)
  q = np.asarray(out.qpos[: min(B, 1024)])
  spread = float(np.std(q, axis=0).max())
  print(f"max per-dof qpos spread across randomized envs after 50 more "
        f"steps: {spread:.3e}")


if __name__ == "__main__":
  main()
