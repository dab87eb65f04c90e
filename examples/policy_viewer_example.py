#!/usr/bin/env python3
"""Neural-network policy driving an ant in the MuJoCo viewer.

A small flax MLP maps (qpos, qvel) to actuator controls each timestep; the
policy + physics step fuse into one jitted JAX function, and the state
streams back into an MjData for the native viewer. The policy starts with
random weights so the ant will flail — the point is that a standard flax
module plugs directly into the mjtpu simulation loop. (Reference capability
map: examples/policy_viewer_example.py, torch.nn + torch.compile there.)

Run on a machine with a display:
    python examples/policy_viewer_example.py [--headless]
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
from flax import linen as nn

import mjtpu


class Policy(nn.Module):
  act_dim: int

  @nn.compact
  def __call__(self, x):
    x = nn.tanh(nn.Dense(64)(x))
    x = nn.tanh(nn.Dense(64)(x))
    return nn.tanh(nn.Dense(self.act_dim)(x))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--steps", type=int, default=2000)
  ap.add_argument("--headless", action="store_true",
                  help="run without the viewer (smoke test)")
  args = ap.parse_args()

  xml = Path(mjtpu.__file__).parent / "zoo" / "assets" / "ant.xml"
  mjm = mujoco.MjModel.from_xml_string(xml.read_text())
  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)

  policy = Policy(act_dim=m.nu)
  params = policy.init(jax.random.PRNGKey(0),
                       jnp.zeros(m.nq + m.nv, d.qpos.dtype))

  @jax.jit
  def policy_step(params, d):
    obs = jnp.concatenate([d.qpos, d.qvel])
    ctrl = policy.apply(params, obs.astype(jnp.float32))
    return mjtpu.step(m, d.replace(ctrl=ctrl.astype(d.ctrl.dtype)))

  d = policy_step(params, d)  # compile
  jax.block_until_ready(d.qpos)

  if args.headless:
    t0 = time.perf_counter()
    for _ in range(args.steps):
      d = policy_step(params, d)
    jax.block_until_ready(d.qpos)
    dt = time.perf_counter() - t0
    print(f"headless: {args.steps} policy+physics steps in {dt:.2f}s "
          f"({args.steps / dt:,.0f} steps/s), qpos[:3]={np.asarray(d.qpos[:3])}")
    return

  # `import mujoco.viewer` would rebind `mujoco` as a local of main() and
  # break the module-level import above (UnboundLocalError)
  from mujoco import viewer as mj_viewer  # needs a display

  mjd = mujoco.MjData(mjm)
  with mj_viewer.launch_passive(mjm, mjd) as viewer:
    for _ in range(args.steps):
      if not viewer.is_running():
        break
      step_start = time.time()
      d = policy_step(params, d)
      mjtpu.device_get_into(mjd, m, d)
      mujoco.mj_forward(mjm, mjd)  # refresh derived quantities for rendering
      viewer.sync()
      leftover = mjm.opt.timestep - (time.time() - step_start)
      if leftover > 0:
        time.sleep(leftover)


if __name__ == "__main__":
  main()
