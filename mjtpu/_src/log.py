"""Library logger (reference mujoco_torch/_src/log.py)."""

from __future__ import annotations

import logging
import os

mujoco_logger = logging.getLogger("mjtpu")
_level = os.environ.get("MJTPU_LOGGING_LEVEL")
if _level:
  mujoco_logger.setLevel(_level.upper())
