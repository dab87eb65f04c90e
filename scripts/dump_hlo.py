"""Dump the lowered HLO / compiled text for a jitted step (the TPU analog of
the reference's scripts/dump_output_code.py, which dumped Inductor kernels).

    python scripts/dump_hlo.py --model humanoid --batch 4 --stage step
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mjtpu

ASSETS = Path(__file__).resolve().parent.parent / "mjtpu" / "zoo" / "assets"


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--model", default="humanoid")
  ap.add_argument("--batch", type=int, default=4)
  ap.add_argument("--stage", default="step",
                  choices=["step", "forward", "solve", "collision"])
  ap.add_argument("--compiled", action="store_true",
                  help="dump backend-compiled text instead of StableHLO")
  args = ap.parse_args()

  mjm = mujoco.MjModel.from_xml_path(str(ASSETS / f"{args.model}.xml"))
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d0 = mjtpu.make_data(m)
  batch = jax.vmap(lambda _: d0)(jnp.arange(args.batch))

  from mjtpu._src import collision_driver, solver

  fns = {
      "step": mjtpu.step,
      "forward": mjtpu.forward,
      "solve": solver.solve,
      "collision": collision_driver.collision,
  }
  fn = jax.vmap(fns[args.stage], in_axes=(None, 0))
  lowered = jax.jit(fn).lower(m, batch)
  if args.compiled:
    print(lowered.compile().as_text())
  else:
    print(lowered.as_text())


if __name__ == "__main__":
  main()
