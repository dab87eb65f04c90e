"""Pallas-SAT narrowphase A/B on a SAT-heavy box pile — one subprocess/arm.

Validates the BASELINE north-star's narrowphase kernel two ways:
  * rig-independently: compiled FLOPs/bytes from compiled.cost_analysis()
    for the Pallas vs jnp SAT paths (the kernel keeps the (ne1*ne2, B)
    projection tensors in VMEM, so compiled bytes should drop);
  * wall-clock: back-to-back settled-pile throughput, same protocol as
    scripts/ab_newton_r4.py (fresh subprocess per arm, no device->host
    fetch before the timed blocks).

The workload is a pile of boxes: box-box narrowphase routes through
collision_convex.convex_convex (SAT), reference workload
mujoco_torch/_src/collision_convex.py:330-601.

Run on the TPU (leave PYTHONPATH alone):
  python scripts/ab_sat.py            # both arms -> benchmarks/results_r4.jsonl
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
    # tag                 sat   batch steps
    # B=8192: the jnp path OOMs (its (B, npair, 12, 12, 3) edge-cross
    # tensor alone is 29 GB > 17 GB HBM); the Pallas kernel — which never
    # materializes it in HBM — runs.  Rig-independent capacity headline.
    ("box_pile/sat=jnp",    "0", 8192, 400),
    ("box_pile/sat=pallas", "1", 8192, 400),
    # B=1024: both fit — the paired wall-clock A/B
    ("box_pile/sat=jnp/B1024",    "0", 1024, 400),
    ("box_pile/sat=pallas/B1024", "1", 1024, 400),
]


def box_pile_xml(n_boxes: int = 9) -> str:
  """n_boxes falling boxes over a plane: every box-box pair is SAT."""
  import numpy as np

  rng = np.random.default_rng(7)
  side = int(np.ceil(n_boxes ** 0.5))
  bodies = []
  for k in range(n_boxes):
    ix, iy = divmod(k, side)
    x = (ix - side / 2) * 0.22 + rng.uniform(-0.03, 0.03)
    y = (iy - side / 2) * 0.22 + rng.uniform(-0.03, 0.03)
    z = 0.12 + 0.1 * (k % 3)
    e = rng.uniform(-0.4, 0.4, 3)
    bodies.append(
        f'<body pos="{x:.3f} {y:.3f} {z:.3f}" euler="{e[0]:.2f} {e[1]:.2f}'
        f' {e[2]:.2f}"><freejoint/>'
        f'<geom type="box" size="0.09 0.07 0.05" mass="0.3"/></body>')
  cap = 6 * n_boxes
  return f"""<mujoco model="box_pile">
  <option timestep="0.002" iterations="4" ls_iterations="6"/>
  <custom><numeric name="max_contact_points" data="{cap}"/>
          <numeric name="max_geom_pairs" data="{cap}"/></custom>
  <worldbody><geom type="plane" size="4 4 .1"/>{''.join(bodies)}</worldbody>
  </mujoco>"""


def run_arm(tag, sat, batch, nsteps, settle):
  os.environ["MJTPU_PALLAS_SAT"] = sat

  import jax
  import jax.numpy as jnp
  import numpy as np

  jax.config.update("jax_compilation_cache_dir", "/tmp/mjtpu_xla_cache")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

  import mujoco

  import mjtpu

  jax.block_until_ready(jnp.ones((256, 256)) @ jnp.ones((256, 256)))

  mjm = mujoco.MjModel.from_xml_string(box_pile_xml())
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d0 = mjtpu.make_data(m)
  rng = np.random.default_rng(0)
  qpos = jnp.asarray(
      mjm.qpos0[None] + rng.uniform(-0.01, 0.01, (batch, mjm.nq)),
      dtype=jnp.float32)
  bd = jax.vmap(lambda q: d0.replace(qpos=q))(qpos)

  step = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)), donate_argnums=1)
  t0 = time.perf_counter()
  compiled = step.lower(m, bd).compile()
  compile_s = time.perf_counter() - t0
  ca = compiled.cost_analysis()
  if isinstance(ca, list):  # older jax returns [dict]
    ca = ca[0]
  flops = ca.get("flops", 0.0)
  byt = ca.get("bytes accessed", 0.0)

  d = compiled(m, bd)
  for _ in range(settle):
    d = compiled(m, d)
  jax.block_until_ready(d.qpos)

  block = max(nsteps // 4, 1)
  rates = []
  done = 0
  while done < nsteps:
    t0 = time.perf_counter()
    for _ in range(block):
      d = compiled(m, d)
    jax.block_until_ready(d.qpos)
    el = time.perf_counter() - t0
    rates.append(batch * block / el)
    done += block

  # guarded fetches: a tunnel fault here must NOT discard the timed rows
  # (measurement-integrity protocol, CLAUDE.md) — report unverified instead
  try:
    ok = bool(jnp.isfinite(d.qpos).all())
    ncon = int(jnp.sum(d.contact.dist[0] < 0))
  except Exception as e:  # noqa: BLE001 — tunnel faults vary
    print(f"# post-run fetch faulted ({e}); rows stand unverified",
          file=sys.stderr, flush=True)
    ok, ncon = None, None
  row = {"tag": tag, "nv": mjm.nv, "batch": batch, "settle": settle,
         "nsteps": done, "compile_s": round(compile_s, 2),
         "steps_per_sec": round(float(np.median(rates)), 1), "finite": ok,
         "active_contacts_env0": ncon,
         "compiled_gflops_per_step": round(flops / 1e9, 3),
         "compiled_gbytes_per_step": round(byt / 1e9, 3),
         "protocol": "settled,subproc-isolated",
         "device": jax.devices()[0].device_kind}
  print(json.dumps(row), flush=True)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--arm", default="")
  ap.add_argument("--settle", type=int, default=400)
  ap.add_argument("--out", default=os.path.join(
      _REPO, "benchmarks", "results_r4.jsonl"))
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
          capture_output=True, text=True, timeout=900, cwd=_REPO)
    except subprocess.TimeoutExpired:
      row = {"tag": tag, "steps_per_sec": None,
             "note": "arm timeout (900s) — dispatch wedged the runtime"}
      print(json.dumps(row), flush=True)
      with open(args.out, "a") as f:
        f.write(json.dumps(row) + "\n")
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
