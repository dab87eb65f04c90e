"""The environment zoo (reference mujoco_torch/zoo/*.py).

Rewards/terminations mirror the Gymnasium-v4 definitions the reference
follows (e.g. humanoid: healthy-z in [1.0, 2.0], forward-vel + 5.0 healthy
- 0.1*||ctrl||^2 — reference zoo/humanoid.py:20-59)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjtpu.zoo.base import MjtpuEnv, register_env


@register_env("cartpole")
class Cartpole(MjtpuEnv):
  xml_name = "cartpole.xml"
  frame_skip = 2
  reset_noise = 0.05
  episode_length = 500

  def _obs(self, data):
    return jnp.concatenate([data.qpos, data.qvel])

  def _reward_done(self, prev, data, action):
    upright = jnp.cos(data.qpos[1])
    reward = upright - 0.01 * jnp.sum(jnp.square(action))
    done = (jnp.abs(data.qpos[0]) > 1.9) | (jnp.abs(data.qpos[1]) > 1.0)
    return reward, done


@register_env("halfcheetah")
class HalfCheetah(MjtpuEnv):
  xml_name = "halfcheetah.xml"
  frame_skip = 5
  reset_noise = 0.1
  episode_length = 1000

  def _obs(self, data):
    return jnp.concatenate([data.qpos[1:], data.qvel])

  def _reward_done(self, prev, data, action):
    fwd = (data.qpos[0] - prev.qpos[0]) / self.dt
    reward = fwd - self._ctrl_cost(action, 0.1)
    return reward, jnp.zeros((), bool)


@register_env("hopper")
class Hopper(MjtpuEnv):
  xml_name = "hopper.xml"
  frame_skip = 4
  reset_noise = 0.005
  episode_length = 1000

  def _obs(self, data):
    return jnp.concatenate([data.qpos[1:], jnp.clip(data.qvel, -10, 10)])

  def _reward_done(self, prev, data, action):
    fwd = (data.qpos[0] - prev.qpos[0]) / self.dt
    healthy = (
        (data.qpos[1] > 0.7)
        & (jnp.abs(data.qpos[2]) < 0.2)
        & jnp.all(jnp.abs(data.qvel) < 10.0)
        & jnp.all(jnp.abs(data.qpos[2:]) < 100.0)
    )
    reward = fwd + 1.0 * healthy - self._ctrl_cost(action, 1e-3)
    return reward, ~healthy


@register_env("walker2d")
class Walker2d(MjtpuEnv):
  xml_name = "walker2d.xml"
  frame_skip = 4
  reset_noise = 0.005
  episode_length = 1000

  def _obs(self, data):
    return jnp.concatenate([data.qpos[1:], jnp.clip(data.qvel, -10, 10)])

  def _reward_done(self, prev, data, action):
    fwd = (data.qpos[0] - prev.qpos[0]) / self.dt
    healthy = (
        (data.qpos[1] > 0.8)
        & (data.qpos[1] < 2.0)
        & (jnp.abs(data.qpos[2]) < 1.0)
    )
    reward = fwd + 1.0 * healthy - self._ctrl_cost(action, 1e-3)
    return reward, ~healthy


@register_env("swimmer")
class Swimmer(MjtpuEnv):
  xml_name = "swimmer.xml"
  frame_skip = 4
  reset_noise = 0.1
  episode_length = 1000

  def _obs(self, data):
    return jnp.concatenate([data.qpos[2:], data.qvel])

  def _reward_done(self, prev, data, action):
    fwd = (data.qpos[0] - prev.qpos[0]) / self.dt
    reward = fwd - self._ctrl_cost(action, 1e-4)
    return reward, jnp.zeros((), bool)


@register_env("ant")
class Ant(MjtpuEnv):
  xml_name = "ant.xml"
  frame_skip = 5
  reset_noise = 0.1
  episode_length = 1000

  def _obs(self, data):
    return jnp.concatenate([data.qpos[2:], data.qvel])

  def _reward_done(self, prev, data, action):
    fwd = (data.qpos[0] - prev.qpos[0]) / self.dt
    healthy = (data.qpos[2] > 0.2) & (data.qpos[2] < 1.0)
    reward = fwd + 1.0 * healthy - self._ctrl_cost(action, 0.5)
    return reward, ~healthy


@register_env("humanoid")
class Humanoid(MjtpuEnv):
  xml_name = "humanoid.xml"
  frame_skip = 5
  reset_noise = 0.01
  episode_length = 1000

  def _obs(self, data):
    return jnp.concatenate([
        data.qpos[2:],
        data.qvel,
        data.cinert[1:].reshape(-1),
        data.cvel[1:].reshape(-1),
        data.qfrc_actuator,
    ])

  def _reward_done(self, prev, data, action):
    fwd = 1.25 * (data.qpos[0] - prev.qpos[0]) / self.dt
    healthy = (data.qpos[2] > 1.0) & (data.qpos[2] < 2.0)
    reward = fwd + 5.0 * healthy - self._ctrl_cost(action, 0.1)
    return reward, ~healthy


@register_env("humanoid_terrain")
class HumanoidTerrain(Humanoid):
  """Humanoid on procedural hfield terrain with mesh obstacles (BASELINE
  config 4: ImplicitFast + mesh + hfield collisions).  The spawn region is
  flat, so rewards/termination match the plane humanoid."""

  xml_name = "humanoid_terrain.xml"

  def _patch_mj_model(self, mjm) -> None:
    import mjtpu

    mjtpu.procedural_terrain(mjm)


@register_env("humanoid_rich")
class HumanoidRich(Humanoid):
  """Humanoid with a richer observation (contact forces + com quantities),
  mirroring the reference's humanoid_rich variant."""

  def _obs(self, data):
    base = super()._obs(data)
    contact = jnp.tanh(0.1 * data.qfrc_constraint)
    return jnp.concatenate([base, contact, data.subtree_com[1].reshape(-1)])
