"""Gradient-based trajectory optimization through contact dynamics.

Demonstrates mjtpu's differentiable mode end-to-end (the capability the
reference exposes via differentiable_mode + tests/test_diff_gradients.py,
reference diff_config.py:43-134): a free ball must bounce off the floor
once and come to rest on a target marker.  The initial velocity is the
decision variable; the loss is the distance to the target after a fixed
rollout, and gradients flow through `mjtpu.step` — including the contact
impulse — via smooth collisions + contacts-from-distance (CFD).

Run (CPU is fine; the model is tiny):

    JAX_PLATFORMS=cpu python examples/diff_optim.py --iters 60

Expected output: the loss falls monotonically-ish from ~1.0 to <1e-2 and
the final print shows the landing position within a few mm of the target.
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
import optax

import mjtpu

_XML = """
<mujoco>
  <option timestep="0.01"/>
  <worldbody>
    <geom type="plane" size="10 10 .1"/>
    <body pos="0 0 1.0">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="0.2"/>
    </body>
  </worldbody>
</mujoco>
"""


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--iters", type=int, default=60)
  ap.add_argument("--steps", type=int, default=120)
  ap.add_argument("--lr", type=float, default=0.3)
  ap.add_argument("--target", type=float, nargs=2, default=(1.5, 0.8))
  args = ap.parse_args()

  mjm = mujoco.MjModel.from_xml_string(_XML)
  m = mjtpu.put_model(mjm)
  d0 = mjtpu.make_data(m)
  target = jnp.asarray(args.target)

  # Trace the rollout inside differentiable mode: the solver switches to
  # fixed iterations and collisions become smoothly blended, so the whole
  # scan is reverse-differentiable.
  with mjtpu.differentiable_mode(smooth_collisions=True, cfd=True,
                                 cfd_width=0.02):

    @jax.jit
    def loss_fn(v0):
      d = d0.replace(qvel=d0.qvel.at[:3].set(v0))

      def body(dd, _):
        return mjtpu.step(m, dd), None

      d_final, _ = jax.lax.scan(body, d, None, length=args.steps)
      pos = d_final.qpos[:2]
      vel = d_final.qvel[:3]
      return jnp.sum((pos - target) ** 2) + 0.01 * jnp.sum(vel**2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    # jit defers tracing to the first call, and DiffConfig is read at TRACE
    # time — so the optimization loop must run inside the context manager
    # (otherwise the solver traces with its reverse-AD-unsupported
    # while_loop and linearization fails).
    v0 = jnp.zeros(3)
    opt = optax.adam(args.lr)
    opt_state = opt.init(v0)

    t0 = time.perf_counter()
    for i in range(args.iters):
      loss, g = grad_fn(v0)
      updates, opt_state = opt.update(g, opt_state)
      v0 = optax.apply_updates(v0, updates)
      if i % 10 == 0 or i == args.iters - 1:
        print(f"iter {i:3d}  loss {float(loss):.5f}  "
              f"v0 {np.asarray(v0).round(3)}")
    print(f"optimized in {time.perf_counter() - t0:.1f}s")

  # Validate the optimized throw with the REAL (non-smoothed) physics.
  d = d0.replace(qvel=d0.qvel.at[:3].set(v0))
  step = jax.jit(mjtpu.step)
  for _ in range(args.steps):
    d = step(m, d)
  final = np.asarray(d.qpos[:2])
  err = float(np.linalg.norm(final - np.asarray(args.target)))
  print(f"hard-physics landing: {final.round(4)}  target {args.target}  "
        f"error {err:.4f} m")
  if err > 0.25:
    raise SystemExit(f"optimization failed to transfer: error {err:.3f} m")
  print("OK")


if __name__ == "__main__":
  main()
