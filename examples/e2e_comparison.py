#!/usr/bin/env python3
"""End-to-end comparison: MuJoCo (C) vs mjtpu (JAX), single env.

Runs the same NSTEPS-step ant trajectory with the same random ctrl sequence
through both engines, reports per-engine wall time and final-state agreement.
(Reference capability map: examples/e2e_comparison.py, which compares C vs
MJX vs torch; here the JAX engine IS the framework.)

Run from the repo root:
    python examples/e2e_comparison.py [--model ant] [--nsteps 1000] [--x64]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--model", default="ant")
  ap.add_argument("--nsteps", type=int, default=1000)
  ap.add_argument("--seed", type=int, default=42)
  ap.add_argument("--x64", action="store_true",
                  help="run mjtpu at float64 (exact parity; use on CPU)")
  args = ap.parse_args()

  if args.x64:
    import jax
    jax.config.update("jax_enable_x64", True)
  import jax
  import mujoco
  import numpy as np

  import mjtpu

  xml = (Path(mjtpu.__file__).parent / "zoo" / "assets" / f"{args.model}.xml")
  mjm = mujoco.MjModel.from_xml_string(xml.read_text())
  rng = np.random.default_rng(args.seed)
  ctrls = rng.uniform(-0.5, 0.5, (args.nsteps, mjm.nu))

  # ── MuJoCo C ──────────────────────────────────────────────────────────
  mjd = mujoco.MjData(mjm)
  t0 = time.perf_counter()
  for i in range(args.nsteps):
    mjd.ctrl[:] = ctrls[i]
    mujoco.mj_step(mjm, mjd)
  t_c = time.perf_counter() - t0
  print(f"MuJoCo C : {args.nsteps} steps in {t_c:.3f}s "
        f"({args.nsteps / t_c:,.0f} steps/s)")

  # ── mjtpu ─────────────────────────────────────────────────────────────
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  step = jax.jit(lambda d, c: mjtpu.step(m, d.replace(ctrl=c)))
  ctrls_j = jax.numpy.asarray(ctrls, d.ctrl.dtype)
  d_w = step(d, ctrls_j[0])  # compile
  jax.block_until_ready(d_w.qpos)
  t0 = time.perf_counter()
  for i in range(args.nsteps):
    d = step(d, ctrls_j[i])
  jax.block_until_ready(d.qpos)
  t_j = time.perf_counter() - t0
  dev = jax.devices()[0].device_kind
  print(f"mjtpu    : {args.nsteps} steps in {t_j:.3f}s "
        f"({args.nsteps / t_j:,.0f} steps/s) on {dev}")

  # ── agreement ─────────────────────────────────────────────────────────
  dq = np.max(np.abs(np.array(mjd.qpos) - np.asarray(d.qpos)))
  dv = np.max(np.abs(np.array(mjd.qvel) - np.asarray(d.qvel)))
  print(f"final-state divergence: max|Δqpos|={dq:.3e}  max|Δqvel|={dv:.3e}")
  print("(float32 trajectories diverge chaotically over hundreds of steps;"
        " run --x64 on CPU for step-for-step parity — see tests/)")


if __name__ == "__main__":
  main()
