"""Differentiable-simulation configuration.

Reference capability map: mujoco_torch/_src/diff_config.py (DiffConfig
thread-local context, differentiable_mode(), smooth collisions, CFD
contacts-from-distance with straight-through estimator, adaptive
integration).  The context is read at trace time, so jit specializes on it
exactly like the reference's compile-time dead-code elimination
(diff_config.py:80-84); a model traced inside ``differentiable_mode()`` is
fully reverse-differentiable (the solver switches to fixed iterations —
``lax.while_loop`` has no transpose).
"""

from __future__ import annotations

import contextlib
import dataclasses
import threading


@dataclasses.dataclass(frozen=True)
class DiffConfig:
  """Differentiable-mode parameters (reference diff_config.py:43-134)."""

  smooth_collisions: bool = True
  smooth_sharpness: float = 100.0   # sigmoid sharpness for case blending
  cfd: bool = True                  # contacts-from-distance
  cfd_width: float = 0.01           # activation distance
  cfd_dc: float = 0.003             # softplus curvature scale
  adaptive_integration: bool = False
  adaptive_substeps: int = 4


_local = threading.local()


def get_diff_config() -> DiffConfig | None:
  """The active DiffConfig, or None outside differentiable mode."""
  return getattr(_local, "config", None)


@contextlib.contextmanager
def differentiable_mode(config: DiffConfig | None = None, **kwargs):
  """Enables differentiable simulation for code traced inside the block."""
  cfg = config or DiffConfig(**kwargs)
  prev = get_diff_config()
  _local.config = cfg
  try:
    yield cfg
  finally:
    _local.config = prev
