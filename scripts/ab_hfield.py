"""Pallas-hfield narrowphase A/B — one subprocess per arm.

Validates the second SURVEY §2.9 native-kernel component (hfield prism
collision; reference workload mujoco_torch/_src/collision_hfield.py:
227-291, :352-390) the same two ways as scripts/ab_sat.py:

  * rig-independently: compiled FLOPs/bytes for the Pallas vs jnp paths
    (the kernel builds surface triangles in VMEM band by band, so the
    per-pair (T, 3, 3) triangle tensors and the seven (T,) per-triangle
    result arrays never touch HBM);
  * wall-clock: back-to-back settled throughput, fresh subprocess per arm,
    no device->host fetch before the timed blocks (CLAUDE.md protocol).

Workloads:
  * terrain_balls: 9 spheres on a FINE 128x128 terrain -> hy=hx=8, the
    T=578 static-triangle cap (the capacity-stress analog of the SAT
    B=8192 arm).
  * humanoid_terrain: BASELINE config 4 (mesh + hfield collisions, 17
    hfield pairs/env at T=50).

Run on the TPU (leave PYTHONPATH alone):
  python scripts/ab_hfield.py        # all arms -> benchmarks/results_r5.jsonl
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
    # tag                              knob  model           batch steps
    # capacity pair: the jnp path's padded triangle tensor
    # f32[B,9,578,3,3]{T(4,128)} is 174.5 GB at B=16384 and still 43.6 GB
    # at B=4096 vs 17 GB HBM (measured 2026-08-21) — it cannot run on any
    # single chip; the kernel never materializes it.  B=4096 keeps the
    # kernel arm's per-dispatch cost inside the tunnel envelope
    # (B=16384 pallas wedged the tunneled runtime).
    ("terrain_balls/hfield=jnp",        "0", "balls",         4096, 400),
    ("terrain_balls/hfield=pallas",     "1", "balls",         4096, 400),
    # wall-clock pair at a batch where both paths fit
    ("terrain_balls/hfield=jnp/B512",    "0", "balls",         512, 400),
    ("terrain_balls/hfield=pallas/B512", "1", "balls",         512, 400),
    ("humanoid_terrain/hfield=jnp",     "0", "humanoid_terrain", 2048, 400),
    ("humanoid_terrain/hfield=pallas",  "1", "humanoid_terrain", 2048, 400),
]


def terrain_balls_xml(n_balls: int = 9) -> str:
  """Spheres on a fine terrain: dx = 2*0.9/127 = 0.014 << rbound = 0.1, so
  the subgrid clamps at the hy = hx = 8 cap -> T = 578 triangles/pair.
  contype/conaffinity mask out ball-ball so the narrowphase is terrain-only."""
  import numpy as np

  rng = np.random.default_rng(11)
  side = int(np.ceil(n_balls ** 0.5))
  bodies = []
  for k in range(n_balls):
    ix, iy = divmod(k, side)
    x = (ix - (side - 1) / 2) * 0.3 + rng.uniform(-0.05, 0.05)
    y = (iy - (side - 1) / 2) * 0.3 + rng.uniform(-0.05, 0.05)
    z = 0.35 + 0.1 * (k % 3)
    bodies.append(
        f'<body pos="{x:.3f} {y:.3f} {z:.3f}"><freejoint/>'
        f'<geom type="sphere" size="0.1" mass="0.2" contype="2"'
        f' conaffinity="1"/></body>')
  return f"""<mujoco model="terrain_balls">
  <option timestep="0.002" iterations="4" ls_iterations="6"/>
  <asset><hfield name="hf" nrow="128" ncol="128" size="0.9 0.9 0.12 0.05"/></asset>
  <worldbody>
    <geom type="hfield" hfield="hf" contype="1" conaffinity="2"/>
    {''.join(bodies)}
  </worldbody>
  </mujoco>"""


def run_arm(tag, knob, model, batch, nsteps, settle):
  os.environ["MJTPU_PALLAS_HFIELD"] = knob

  import jax
  import jax.numpy as jnp
  import numpy as np

  jax.config.update("jax_compilation_cache_dir", "/tmp/mjtpu_xla_cache")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

  import mujoco

  import mjtpu

  jax.block_until_ready(jnp.ones((256, 256)) @ jnp.ones((256, 256)))

  if model == "balls":
    mjm = mujoco.MjModel.from_xml_string(terrain_balls_xml())
    rng_h = np.random.default_rng(5)
    mjm.hfield_data[:] = rng_h.uniform(0.0, 1.0, mjm.hfield_data.shape)
  else:
    mjm = mujoco.MjModel.from_xml_path(
        os.path.join(_REPO, "mjtpu", "zoo", "assets", f"{model}.xml"))
    mjtpu.procedural_terrain(mjm)
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

  # guarded fetches: a tunnel fault must NOT discard the timed rows
  ok, ncon, nres = None, None, None
  try:
    ok = bool(jnp.isfinite(d.qpos[:1024]).all())
    ncon = int(jnp.sum(d.contact.dist[0] < 0))
    nres = int(d.nreset[:1024].sum())
  except Exception as e:  # noqa: BLE001 — tunnel faults vary
    print(f"# post-run fetch faulted ({e}); rows stand unverified",
          file=sys.stderr, flush=True)
  row = {"tag": tag, "nv": mjm.nv, "batch": batch, "settle": settle,
         "nsteps": done, "compile_s": round(compile_s, 2),
         "steps_per_sec": round(float(np.median(rates)), 1), "finite": ok,
         "reset_count": nres, "active_contacts_env0": ncon,
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
