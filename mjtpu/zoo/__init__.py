"""mjtpu.zoo — batched RL environments over the mjtpu engine.

Reference capability map: mujoco_torch/zoo/ (base + envs + CMG math)."""

from mjtpu.zoo import envs as _envs  # registers the standard envs
from mjtpu.zoo import satellite as _satellite  # registers satellite envs
from mjtpu.zoo.base import ENVS, MjtpuEnv, State, register_env
from mjtpu.zoo import cmg
