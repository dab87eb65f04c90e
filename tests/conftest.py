"""Test configuration: parity tests run float64 on the CPU backend
(SURVEY.md §4 port implication — TPU runs are f32/bf16 throughput runs).
A virtual 8-device CPU mesh backs the sharding tests."""

import pathlib
import sys

# make the repo importable without touching PYTHONPATH (which carries the
# TPU plugin path on the bench machine)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8"
  ).strip()

import jax

jax.config.update("jax_enable_x64", True)
# persistent compile cache: XLA's in-process CPU compiler segfaults
# sporadically after many compilations in one process (observed in
# backend_compile_and_load across unrelated tests); cached executables
# bypass the crashing path entirely on reruns, and completed compiles
# survive a crashed run — so repeated runs converge to a warm, stable,
# much faster suite.
# The cache dir is keyed by the host CPU's feature set: XLA's cache key
# does NOT include machine features, and this VM migrates between hosts
# with different CPUs — loading a foreign AOT blob logs "could lead to
# execution errors such as SIGILL" and (observed 2026-08-19) silently
# MISCOMPUTES gathers, turning green tests red with wrong numerics.
import hashlib
import platform

try:
  with open("/proc/cpuinfo") as _fh:
    _cpu_sig = next(
        (ln for ln in _fh if ln.startswith("flags")), platform.processor())
except OSError:
  _cpu_sig = platform.processor()
_cpu_tag = hashlib.sha1(_cpu_sig.encode()).hexdigest()[:10]
jax.config.update(
    "jax_compilation_cache_dir", f"/tmp/mjtpu_xla_cache_cpu_{_cpu_tag}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# XLA's CPU JIT leaks ~1k mmap regions per large compiled executable; a full
# one-process suite run crosses the default vm.max_map_count (65530) around
# test ~68 and the NEXT executable load segfaults (measured: map count grew
# 9k -> 65k over the run; crash stacks land wherever the allocation happens —
# compile, cache write, or cache read).  Raise the limit when we can.
try:
  with open("/proc/sys/vm/max_map_count") as fh:
    if int(fh.read()) < 262144:
      with open("/proc/sys/vm/max_map_count", "w") as fw:
        fw.write("1048576")
except (OSError, PermissionError):
  pass  # non-root or non-Linux: the per-file test recipe still works

# the axon TPU plugin (loaded via the machine's PYTHONPATH sitecustomize)
# force-claims the TPU regardless of JAX_PLATFORMS; parity tests MUST run on
# CPU at f64.  Launch pytest as `PYTHONPATH=/root/repo python -m pytest ...`
# (clobbering the plugin path) — this assert catches silent TPU fallthrough,
# where f64 trig runs at f32 precision and every tolerance is garbage.
assert jax.devices()[0].platform == "cpu", (
    "parity tests must run on the CPU backend: launch with "
    "PYTHONPATH=<repo> so the axon TPU plugin is not on sys.path"
)

import mujoco
import numpy as np
import pytest

MODEL_DIR = pathlib.Path(__file__).parent / "models"


def load_mj(name: str) -> mujoco.MjModel:
  return mujoco.MjModel.from_xml_path(str(MODEL_DIR / name))


@pytest.fixture
def rng():
  return np.random.default_rng(0)
