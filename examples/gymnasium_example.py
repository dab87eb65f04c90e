#!/usr/bin/env python3
"""Gymnasium integration example for mjtpu.

Wraps the mjtpu engine in a standard single-env Gymnasium environment so it
can be used with any Gymnasium-compatible RL library. (Reference capability
map: examples/gymnasium_example.py — the torch wrapper there; here the
physics step is a jitted JAX function and observations round-trip to numpy.)

Run from the repo root:
    python examples/gymnasium_example.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import gymnasium as gym
import jax
import mujoco
import numpy as np

import mjtpu

MODEL_XML = (Path(mjtpu.__file__).parent / "zoo" / "assets" / "ant.xml").read_text()


class MjtpuGymEnv(gym.Env):
  """Gymnasium wrapper around a single mjtpu simulation."""

  metadata = {"render_modes": ["rgb_array"]}

  def __init__(self, xml_string: str, max_episode_steps: int = 1000,
               render_mode: str | None = None, frame_skip: int = 5):
    super().__init__()
    self.mj_model = mujoco.MjModel.from_xml_string(xml_string)
    self.m = mjtpu.put_model(self.mj_model)
    self._d0 = mjtpu.make_data(self.m)
    self.max_episode_steps = max_episode_steps
    self.render_mode = render_mode
    self.frame_skip = frame_skip
    self._rd = mjtpu.precompute_render_data(self.m) if render_mode else None

    nq, nv, nu = self.m.nq, self.m.nv, self.m.nu
    self.observation_space = gym.spaces.Box(-np.inf, np.inf, (nq - 2 + nv,), np.float64)
    lo, hi = self.mj_model.actuator_ctrlrange.T.astype(np.float32)
    self.action_space = gym.spaces.Box(lo, hi, (nu,), np.float32)

    def _step(d, ctrl):
      d = d.replace(ctrl=ctrl.astype(d.ctrl.dtype))
      for _ in range(self.frame_skip):
        d = mjtpu.step(self.m, d)
      return d

    self._step_fn = jax.jit(_step)
    self._fwd = jax.jit(lambda d: mjtpu.forward(self.m, d))
    self._d = None
    self._t = 0

  def _obs(self, d) -> np.ndarray:
    # standard gym ant-style obs: qpos without root xy, full qvel
    return np.concatenate([np.asarray(d.qpos)[2:], np.asarray(d.qvel)])

  def reset(self, *, seed=None, options=None):
    super().reset(seed=seed)
    rng = np.random.default_rng(seed)
    qpos = np.asarray(self._d0.qpos) + rng.uniform(-0.1, 0.1, self.m.nq)
    qvel = 0.1 * rng.standard_normal(self.m.nv)
    d = self._d0.replace(qpos=qpos, qvel=qvel)
    self._d = self._fwd(d)
    self._t = 0
    return self._obs(self._d), {}

  def step(self, action):
    prev_x = float(self._d.qpos[0])
    self._d = self._step_fn(self._d, jax.numpy.asarray(action))
    self._t += 1
    dt = float(self.mj_model.opt.timestep) * self.frame_skip
    forward_reward = (float(self._d.qpos[0]) - prev_x) / dt
    ctrl_cost = 0.5 * float(np.sum(np.square(action)))
    reward = forward_reward - ctrl_cost + 1.0  # healthy bonus
    z = float(self._d.qpos[2])
    terminated = not (0.2 <= z <= 1.0) or not np.isfinite(
        np.asarray(self._d.qpos)).all()
    truncated = self._t >= self.max_episode_steps
    return self._obs(self._d), reward, terminated, truncated, {}

  def render(self):
    if self.render_mode != "rgb_array":
      return None
    img = mjtpu.render(self.m, self._d, width=240, height=180, rd=self._rd)
    return np.asarray(img)


def main():
  env = MjtpuGymEnv(MODEL_XML)
  obs, _ = env.reset(seed=0)
  print(f"obs shape: {obs.shape}  action space: {env.action_space.shape}")
  total = 0.0
  for t in range(200):
    action = env.action_space.sample()
    obs, reward, terminated, truncated, _ = env.step(action)
    total += reward
    if terminated or truncated:
      print(f"episode ended at t={t}, return={total:.2f}")
      obs, _ = env.reset()
      total = 0.0
  print(f"done; final qpos[:3] = {obs[:3]}")


if __name__ == "__main__":
  main()
