"""Satellite attitude-control envs with CMG clusters.

Reference capability map: mujoco_torch/zoo/satellite.py (small/large
variants with CMG gimbal control).  Gimbal hinge angles are real joints;
the CMG reaction torque -h0 * J(delta) @ delta_dot acts on the satellite
body through xfrc_applied (momentum exchange with the always-spinning
rotors, which are modeled through the cluster Jacobian rather than as
explicit fast-spinning bodies)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

import mjtpu
from mjtpu._src import math as mj_math
from mjtpu.zoo import cmg
from mjtpu.zoo.base import MjtpuEnv, register_env


@register_env("satellite")
class Satellite(MjtpuEnv):
  xml_name = "satellite.xml"
  frame_skip = 2
  reset_noise = 0.2
  episode_length = 500
  h0 = 5.0  # rotor momentum magnitude

  def __init__(self, dtype=None, **kwargs):
    super().__init__(dtype=dtype, **kwargs)
    self.g_axes, self.s_axes0 = cmg.pyramid_cluster()

  def _cmg_torque(self, data):
    delta = data.qpos[7:11]
    delta_dot = data.qvel[6:10]
    jac = cmg.cluster_jacobian(self.g_axes, self.s_axes0, delta, self.h0)
    torque_body = -(jac @ delta_dot)
    # rotate to world (torque applied on the satellite body frame)
    return mj_math.rotate(torque_body, data.xquat[1])

  def step(self, state, action):
    torque = self._cmg_torque(state.data)
    xfrc = state.data.xfrc_applied.at[1, 3:].set(torque)
    state = state.replace(data=state.data.replace(xfrc_applied=xfrc))
    return super().step(state, action)

  def _obs(self, data):
    delta = data.qpos[7:11]
    jac = cmg.cluster_jacobian(self.g_axes, self.s_axes0, delta, self.h0)
    manip = cmg.manipulability(jac)
    return jnp.concatenate([
        data.qpos[3:7],       # attitude quaternion
        data.qvel[3:6],       # body angular velocity
        jnp.sin(delta),
        jnp.cos(delta),
        data.qvel[6:10],      # gimbal rates
        manip[None],
    ])

  def _reward_done(self, prev, data, action):
    # pointing: align body z with world z; regularize spin & gimbal effort
    quat = data.qpos[3:7]
    bz = mj_math.rotate(jnp.array([0.0, 0.0, 1.0], quat.dtype), quat)
    pointing = bz[2]
    spin = jnp.sum(jnp.square(data.qvel[3:6]))
    reward = pointing - 0.1 * spin - 0.01 * jnp.sum(jnp.square(action))
    return reward, jnp.zeros((), bool)


@register_env("satellite_large")
class SatelliteLarge(Satellite):
  """6-CMG orthogonal cluster variant (reference's satellite large)."""

  h0 = 8.0

  def __init__(self, dtype=None, **kwargs):
    MjtpuEnv.__init__(self, dtype=dtype, **kwargs)
    self.g_axes, self.s_axes0 = cmg.ortho_cluster()
    # only 4 gimbal joints exist in the MJCF; the large cluster uses the
    # first 4 + 2 virtual (fixed) gimbals folded into the Jacobian
    self.g_axes = self.g_axes[:4]
    self.s_axes0 = self.s_axes0[:4]
