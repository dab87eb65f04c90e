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


class _SatelliteCMG(MjtpuEnv):
  """Satellite with explicit gimbal+rotor CMG bodies.

  Unlike the legacy `satellite` env above (momentum-Jacobian torque via
  xfrc_applied), these model the rotors as real spinning bodies: the
  gyroscopic bus torque arises from the Coriolis terms of the multibody
  dynamics.  Matches the reference plants exactly in dimension and
  structure (mujoco_torch/zoo/satellite.py:7-22: large nq=15/nv=14/nu=8,
  small nq=19/nv=18/nu=12; obs = bus_quat + bus_omega + joint angles +
  joint rates = 7 + 4*n_gimbals).

  The policy commands the n_gimbals gimbal-rate servos; the rotor-speed
  servos are held at `rotor_speed` (reference _prepare_ctrl,
  zoo/satellite.py:98-105).  Reward = sun alignment (body +Z toward the
  world +Z sun) - ctrl cost - angular-velocity penalty; episodes never
  terminate (satellites don't crash), only truncate."""

  n_gimbals: int = 0
  rotor_speed: float = 100.0
  frame_skip = 10
  reset_noise = 0.001
  episode_length = 500
  ctrl_cost_weight = 0.01
  ang_vel_weight = 0.1

  @property
  def action_size(self) -> int:
    return self.n_gimbals

  def _rotor_dofs(self):
    # joints interleave per CMG (g1 r1 g2 r2 ...): rotor dof = 6 + 2i + 1
    return [6 + 2 * i + 1 for i in range(self.n_gimbals)]

  def _prepare_ctrl(self, action):
    rotor = jnp.full(
        (self.n_gimbals,), self.rotor_speed, dtype=action.dtype
    )
    return jnp.concatenate([action, rotor])

  def _noisy_init(self, data_key):
    data = super()._noisy_init(data_key)
    # rotors spin at speed from the start (reference _make_batch,
    # zoo/satellite.py:107-111)
    qvel = data.qvel.at[jnp.asarray(self._rotor_dofs())].set(
        self.rotor_speed
    )
    return data.replace(qvel=qvel)

  def _obs(self, data):
    return jnp.concatenate([
        data.qpos[3:7],   # bus attitude quaternion (w, x, y, z)
        data.qvel[3:6],   # bus angular velocity
        data.qpos[7:],    # gimbal + rotor angles
        data.qvel[6:],    # gimbal + rotor rates
    ])

  def _reward_done(self, prev, data, action):
    # body +Z on world +Z (the sun): z'z of the rotation matrix is
    # 1 - 2(qx^2 + qy^2)
    qx, qy = data.qpos[4], data.qpos[5]
    sun_alignment = 1.0 - 2.0 * (qx * qx + qy * qy)
    ctrl_cost = self._ctrl_cost(action, self.ctrl_cost_weight)
    spin = self.ang_vel_weight * jnp.sum(jnp.square(data.qvel[3:6]))
    return sun_alignment - ctrl_cost - spin, jnp.zeros((), bool)


@register_env("satellite_large")
class SatelliteLarge(_SatelliteCMG):
  """500 kg-class bus, 4-CMG pyramid (beta = arctan sqrt 2)."""

  xml_name = "satellite_large.xml"
  n_gimbals = 4
  rotor_speed = 100.0


@register_env("satellite_small")
class SatelliteSmall(_SatelliteCMG):
  """CubeSat bus, redundant 6-CMG cluster (one per face)."""

  xml_name = "satellite_small.xml"
  n_gimbals = 6
  rotor_speed = 200.0
