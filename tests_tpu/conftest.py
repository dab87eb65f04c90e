"""Device smoke tier: runs on the REAL accelerator (f32), unlike tests/
whose conftest forces the CPU backend at f64 for parity oracles.

Run from the repo root with the machine's default environment (the TPU
plugin on PYTHONPATH):  python -m pytest tests_tpu/ -q
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import pytest


@pytest.fixture(scope="session", autouse=True)
def _require_accelerator():
  if jax.devices()[0].platform == "cpu":
    pytest.skip("device smoke tier needs a real accelerator backend",
                allow_module_level=True)
