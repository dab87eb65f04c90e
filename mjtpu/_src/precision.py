"""Matmul-precision policy for the engine's public entry points.

On TPU, JAX lowers float32 ``dot_general`` to bfloat16 MXU passes by
default (DEFAULT precision).  bf16's 8-bit mantissa corrupts the CRBA
mass matrix, the Cholesky solves and the Newton Hessian enough to
destabilize contact-rich f32 simulation: fallen humanoids blow up
(~1%/step env reset rate), while the same states are stable on CPU at
f32.  Empirically (see PERFORMANCE.md):

  - DEFAULT (bf16):   blowup within ~250 steps on a fallen-humanoid batch
  - HIGH (bf16_3x):   zero blowups in 1200 steps, *no* throughput cost
  - HIGHEST (f32):    zero blowups, ~5% slower

so the engine wraps its entry points in ``jax.default_matmul_precision``
with HIGH by default.  Override with ``MJTPU_MATMUL_PRECISION`` in
{"default", "high", "highest"} ("default" restores JAX's bf16 behavior).

The reference (CUDA f32) gets full-f32 matmuls from cuBLAS implicitly and
never faced this; on TPU the precision policy is an explicit design
decision, hence this module.
"""

from __future__ import annotations

import functools
import os

import jax

_PRECISION = os.environ.get("MJTPU_MATMUL_PRECISION", "high")
assert _PRECISION in ("default", "high", "highest"), _PRECISION


def matmul_precision(fn):
  """Wrap an entry point so all dots trace at the configured precision."""
  if _PRECISION == "default":
    return fn

  @functools.wraps(fn)
  def wrapped(*args, **kwargs):
    with jax.default_matmul_precision(_PRECISION):
      return fn(*args, **kwargs)

  return wrapped
