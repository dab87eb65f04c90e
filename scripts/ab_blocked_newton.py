"""Back-to-back A/B on scene_pile: CG (as shipped) vs dense-Hessian Newton
vs forest-block-PCG Newton, plus an nv>=408 pile probe for the big-scene
compile path.  Run on the TPU (leave PYTHONPATH alone).

Usage: python scripts/ab_blocked_newton.py [batch] [nsteps] [nbig]
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mjtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import mujoco

import mjtpu


def big_pile_xml(n_bodies: int, iterations: int = 10) -> str:
  """n_bodies spheres in a loose grid over a plane (nv = 6 * n_bodies)."""
  rng = np.random.default_rng(3)
  side = int(np.ceil(n_bodies ** (1.0 / 3.0)))
  bodies = []
  k = 0
  for ix in range(side):
    for iy in range(side):
      for iz in range(side):
        if k >= n_bodies:
          break
        x = (ix - side / 2) * 0.25 + rng.uniform(-0.02, 0.02)
        y = (iy - side / 2) * 0.25 + rng.uniform(-0.02, 0.02)
        z = 0.15 + iz * 0.24
        bodies.append(
            f'<body pos="{x:.3f} {y:.3f} {z:.3f}"><freejoint/>'
            f'<geom type="sphere" size="0.1" mass="0.4"/></body>')
        k += 1
  cap = 4 * n_bodies
  return f"""<mujoco model="big_pile">
  <option timestep="0.002" solver="Newton" iterations="{iterations}"/>
  <custom><numeric name="max_contact_points" data="{cap}"/>
          <numeric name="max_geom_pairs" data="{cap}"/></custom>
  <worldbody><geom type="plane" size="8 8 .1"/>{''.join(bodies)}</worldbody>
  </mujoco>"""


def measure(tag, mjm, batch, nsteps, warm=20):
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d0 = mjtpu.make_data(m)
  rng = np.random.default_rng(0)
  qpos = jnp.asarray(
      mjm.qpos0[None] + rng.uniform(-0.01, 0.01, (batch, mjm.nq)),
      dtype=jnp.float32)
  batch_d = jax.vmap(lambda q: d0.replace(qpos=q))(qpos)
  step_fn = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)),
                    donate_argnums=(1,))
  t0 = time.perf_counter()
  batch_d = step_fn(m, batch_d)
  jax.block_until_ready(batch_d.qpos)
  compile_s = time.perf_counter() - t0
  for _ in range(warm):
    batch_d = step_fn(m, batch_d)
  jax.block_until_ready(batch_d.qpos)
  t0 = time.perf_counter()
  for _ in range(nsteps):
    batch_d = step_fn(m, batch_d)
  jax.block_until_ready(batch_d.qpos)
  el = time.perf_counter() - t0
  rate = batch * nsteps / el
  ok = bool(jnp.isfinite(batch_d.qpos).all())
  row = {"tag": tag, "model": mjm.names.split(b"\x00")[1].decode() or "pile",
         "nv": mjm.nv, "batch": batch, "nsteps": nsteps,
         "compile_s": round(compile_s, 2), "steps_per_sec": round(rate, 1),
         "finite": ok, "device": jax.devices()[0].device_kind}
  print(json.dumps(row), flush=True)
  return row


def main():
  batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
  nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
  nbig = int(sys.argv[3]) if len(sys.argv) > 3 else 68

  pile = os.path.join(_REPO, "mjtpu", "zoo", "assets", "scene_pile.xml")
  rows = []

  mjm = mujoco.MjModel.from_xml_path(pile)
  rows.append(measure("scene_pile/CG", mjm, batch, nsteps))

  mjm = mujoco.MjModel.from_xml_path(pile)
  mjm.opt.solver = int(mujoco.mjtSolver.mjSOL_NEWTON)
  mjm.opt.iterations = 10
  os.environ["MJTPU_NEWTON_PCG"] = "0"
  rows.append(measure("scene_pile/Newton-dense", mjm, batch, nsteps))
  os.environ["MJTPU_NEWTON_PCG"] = "1"
  rows.append(measure("scene_pile/Newton-blockpcg", mjm, batch, nsteps))

  # big-nv probe: nv = 6 * nbig (>= 400 when nbig >= 67)
  big = mujoco.MjModel.from_xml_string(big_pile_xml(nbig))
  rows.append(measure(f"big_pile{nbig}/Newton-blockpcg", big,
                      min(batch, 64), max(nsteps // 2, 50)))

  out = os.path.join(_REPO, "benchmarks", "results_r3.jsonl")
  with open(out, "a") as f:
    for r in rows:
      f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
  main()
