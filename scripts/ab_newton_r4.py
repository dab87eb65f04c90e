"""Solver A/B on scene_pile / big_pile — one subprocess per arm.

Round-4 measurement-integrity finding: r3's ab_blocked_newton.py timed all
arms in ONE process with a device->host fetch (`bool(jnp.isfinite(...))`)
between arms.  On this runtime a single fetch permanently degrades the
process to synchronous ~per-step dispatch (CLAUDE.md), so every row after
the first measured the degraded host path, not the solver: Newton-dense
scene_pile B=512 recorded 1.8k steps/s in r3 vs ~1.3M measured clean.
Protocol here:

  * each arm runs in a fresh subprocess (health-checked, bounded);
  * the pile is settled IN-ARM (600 steps, no fetch) before timed blocks,
    so rates reflect the contact-rich settled regime, not free-fall;
  * the only device->host fetch happens after the final timed block.

Run on the TPU (leave PYTHONPATH alone):
  python scripts/ab_newton_r4.py            # all arms -> results_r4.jsonl
  python scripts/ab_newton_r4.py --arm ...  # internal: one arm
"""

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

ARMS = [
    # tag                                model    solver  pcg chunks batch steps
    ("scene_pile/CG",                    "pile",  "cg",     0, 1, 512, 200),
    ("scene_pile/CG/K8",                 "pile",  "cg",     0, 8, 512, 200),
    ("scene_pile/Newton-dense",          "pile",  "newton", 0, 1, 512, 200),
    ("scene_pile/Newton-dense/K8",       "pile",  "newton", 0, 8, 512, 200),
    ("scene_pile/Newton-blockpcg",       "pile",  "newton", 1, 1, 512, 25),
    ("scene_pile/Newton-dense/B4096",    "pile",  "newton", 0, 1, 4096, 200),
    ("big_pile68/Newton-dense",          "big68", "newton", 0, 1, 64, 100),
    ("big_pile68/Newton-blockpcg",       "big68", "newton", 1, 1, 64, 25),
]


def big_pile_xml(n_bodies: int, iterations: int = 10) -> str:
  """n_bodies spheres in a loose grid over a plane (nv = 6 * n_bodies)."""
  import numpy as np

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


def run_arm(tag, model, solver, pcg, chunks, batch, nsteps, settle):
  os.environ["MJTPU_NEWTON_PCG"] = str(pcg)

  t_start = time.perf_counter()

  def mark(what):
    print(f"## t+{time.perf_counter() - t_start:6.1f}s {what}",
          file=sys.stderr, flush=True)

  import jax
  import jax.numpy as jnp
  import numpy as np

  jax.config.update("jax_compilation_cache_dir", "/tmp/mjtpu_xla_cache")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

  import mujoco

  import mjtpu
  from mjtpu.parallel import chunked_step

  mark("imports done")
  # health check: a wedged tunnel fails fast here, not mid-measurement
  jax.block_until_ready(jnp.ones((256, 256)) @ jnp.ones((256, 256)))
  mark("health check done")

  if model == "pile":
    mjm = mujoco.MjModel.from_xml_path(
        os.path.join(_REPO, "mjtpu", "zoo", "assets", "scene_pile.xml"))
  else:
    mjm = mujoco.MjModel.from_xml_string(big_pile_xml(68))
  if solver == "newton":
    mjm.opt.solver = int(mujoco.mjtSolver.mjSOL_NEWTON)
    mjm.opt.iterations = 10
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d0 = mjtpu.make_data(m)
  rng = np.random.default_rng(0)
  qpos = jnp.asarray(
      mjm.qpos0[None] + rng.uniform(-0.01, 0.01, (batch, mjm.nq)),
      dtype=jnp.float32)
  bd = jax.vmap(lambda q: d0.replace(qpos=q))(qpos)

  mark("model + batch built")
  stepper = chunked_step(m, chunks)
  t0 = time.perf_counter()
  parts = stepper.split(bd)
  parts = stepper.step_parts(parts)
  jax.block_until_ready(parts[-1].qpos)
  compile_s = time.perf_counter() - t0
  mark(f"compile + first step done ({compile_s:.1f}s)")

  # settle (no fetch): rates below are the contact-rich settled regime
  for _ in range(settle):
    parts = stepper.step_parts(parts)
  jax.block_until_ready(parts[-1].qpos)
  mark("settle done")

  block = max(nsteps // 4, 1)
  rates = []
  done = 0
  while done < nsteps:
    t0 = time.perf_counter()
    for _ in range(block):
      parts = stepper.step_parts(parts)
    jax.block_until_ready(parts[-1].qpos)
    el = time.perf_counter() - t0
    rates.append(batch * block / el)
    done += block

  mark("timed blocks done")
  row = {"tag": tag, "nv": mjm.nv, "batch": batch, "chunks": len(parts),
         "settle": settle, "nsteps": done, "compile_s": round(compile_s, 2),
         "steps_per_sec": round(float(np.median(rates)), 1), "finite": None,
         "reset_count": None,
         "protocol": "settled,subproc-isolated",
         "device": jax.devices()[0].device_kind}
  # print the timed row BEFORE the fetch: on this runtime the fetch can
  # HANG (not just fault), and a parent timeout must never discard the
  # timed data (CLAUDE.md protocol; consumers take the LAST json line)
  print(json.dumps(row), flush=True)
  # the ONLY fetch, after the final timed block; a tunnel fault here must
  # not discard the timed data — report finite=None ("unverified") instead
  try:
    row["finite"] = bool(jnp.isfinite(parts[0].qpos[:1024]).all())
    row["reset_count"] = int(parts[0].nreset[:1024].sum())
  except Exception as e:  # noqa: BLE001 — tunnel faults vary
    print(f"## finite fetch failed: {type(e).__name__}", file=sys.stderr,
          flush=True)
  mark("finite fetch done")
  print(json.dumps(row), flush=True)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--arm", default="")
  ap.add_argument("--settle", type=int, default=600)
  ap.add_argument("--out", default=os.path.join(
      _REPO, "benchmarks", "results_r5.jsonl"))
  args = ap.parse_args()

  if args.arm:
    arm = next(a for a in ARMS if a[0] == args.arm)
    run_arm(*arm, settle=args.settle)
    return

  for arm in ARMS:
    tag = arm[0]
    print(f"# arm: {tag}", file=sys.stderr, flush=True)
    try:
      proc = subprocess.run(
          [sys.executable, os.path.abspath(__file__), "--arm", tag,
           "--settle", str(args.settle)],
          capture_output=True, text=True, timeout=600, cwd=_REPO)
    except subprocess.TimeoutExpired:
      row = {"tag": tag, "steps_per_sec": None,
             "note": "arm timeout (600s) — dispatch wedged the runtime"}
      print(json.dumps(row), flush=True)
      with open(args.out, "a") as f:
        f.write(json.dumps(row) + "\n")
      # a wedged tunnel takes minutes to recover; give the next arm a chance
      print("# waiting 150s for tunnel recovery", file=sys.stderr, flush=True)
      time.sleep(150)
      continue
    sys.stderr.write(proc.stderr[-2000:] if proc.stderr else "")
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if line:
      print(line[-1], flush=True)
      with open(args.out, "a") as f:
        f.write(line[-1] + "\n")
    else:
      row = {"tag": tag, "steps_per_sec": None,
             "note": f"arm failed rc={proc.returncode}"}
      print(json.dumps(row), flush=True)
      with open(args.out, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
  main()
