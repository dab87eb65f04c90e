"""Back-to-back A/B: pyramidal vs elliptic humanoid_bench on the local chip.

Prints per-variant steps/s, compiled FLOPs/bytes (cost_analysis), and an HLO
op histogram diff to localize where the elliptic path loses time.
Usage: python scripts/ab_cone.py [batch] [nsteps]
"""

import collections
import os
import re
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


def build(cone, batch):
  mjm = mujoco.MjModel.from_xml_path(
      os.path.join(_REPO, "mjtpu", "zoo", "assets", "humanoid_bench.xml"))
  mjm.opt.cone = {"pyramidal": 0, "elliptic": 1}[cone]
  m = mjtpu.put_model(mjm, dtype=jnp.float32)
  d0 = mjtpu.make_data(m)
  rng = np.random.default_rng(0)
  qpos = jnp.asarray(
      mjm.qpos0[None] + rng.uniform(-0.01, 0.01, (batch, mjm.nq)),
      dtype=jnp.float32)
  batch_d = jax.vmap(lambda q: d0.replace(qpos=q))(qpos)
  step_fn = jax.jit(jax.vmap(mjtpu.step, in_axes=(None, 0)),
                    donate_argnums=(1,))
  return m, batch_d, step_fn


def hlo_histogram(text):
  hist = collections.Counter()
  for line in text.splitlines():
    mm = re.search(r"= \w[\w\[\],{}<>/# ]*? (\w[\w.-]*)\(", line)
    if mm:
      hist[mm.group(1)] += 1
  return hist


def measure(cone, batch, nsteps):
  m, d, step_fn = build(cone, batch)
  lowered = step_fn.lower(m, d)
  compiled = lowered.compile()
  try:
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = ca.get("flops", -1)
    bytes_ = ca.get("bytes accessed", -1)
  except Exception as e:
    flops = bytes_ = f"err {e}"
  hist = hlo_histogram(compiled.as_text())
  # warm
  for _ in range(20):
    d = step_fn(m, d)
  jax.block_until_ready(d.qpos)
  t0 = time.perf_counter()
  for _ in range(nsteps):
    d = step_fn(m, d)
  jax.block_until_ready(d.qpos)
  el = time.perf_counter() - t0
  rate = batch * nsteps / el
  print(f"{cone}: {rate:,.0f} steps/s ({el:.3f}s for {nsteps} steps) "
        f"flops={flops} bytes={bytes_}")
  return rate, hist


def main():
  batch = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
  nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
  print(f"device: {jax.devices()[0].device_kind}, B={batch}")
  r_p, h_p = measure("pyramidal", batch, nsteps)
  r_e, h_e = measure("elliptic", batch, nsteps)
  print(f"\nelliptic/pyramidal = {r_e / r_p:.3f}")
  print("\nHLO op histogram (elliptic - pyramidal, |diff|>0):")
  keys = sorted(set(h_p) | set(h_e),
                key=lambda k: -(h_e.get(k, 0) - h_p.get(k, 0)))
  for k in keys:
    dv = h_e.get(k, 0) - h_p.get(k, 0)
    if dv:
      print(f"  {k:32s} pyr={h_p.get(k, 0):5d} ell={h_e.get(k, 0):5d} "
            f"diff={dv:+d}")


if __name__ == "__main__":
  main()
