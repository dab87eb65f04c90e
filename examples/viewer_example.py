"""Interactive viewer: simulate in mjtpu, display with the MuJoCo viewer.

Reference capability map: examples/viewer_example.py — physics steps on the
accelerator, state streams back into an MjData via get_data_into for the
native viewer (run on a machine with a display):

    python examples/viewer_example.py --env humanoid
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


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--env", default="humanoid")
  ap.add_argument("--steps", type=int, default=2000)
  args = ap.parse_args()

  xml = Path(__file__).parent.parent / "mjtpu" / "zoo" / "assets" / f"{args.env}.xml"
  mjm = mujoco.MjModel.from_xml_path(str(xml))
  mjd = mujoco.MjData(mjm)
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  step = jax.jit(mjtpu.step)

  try:
    import mujoco.viewer

    with mujoco.viewer.launch_passive(mjm, mjd) as viewer:
      for _ in range(args.steps):
        d = step(m, d)
        mjtpu.get_data_into(mjd, m, d)
        mujoco.mj_forward(mjm, mjd)  # refresh render-side derived data
        viewer.sync()
        time.sleep(float(mjm.opt.timestep))
  except Exception as e:  # headless fallback: print a state trace
    print(f"(viewer unavailable: {e}); running headless")
    for i in range(min(args.steps, 100)):
      d = step(m, d)
      if i % 20 == 0:
        print(f"t={float(d.time):.3f}s qpos[:3]={np.asarray(d.qpos)[:3]}")


if __name__ == "__main__":
  main()
