"""Control-moment-gyroscope (CMG) math for the satellite envs.

Reference capability map: mujoco_torch/zoo/cmg.py (Rodrigues rotation, CMG
cluster Jacobian, manipulability score, 4-pyramid / 6-orthogonal cluster
geometries)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# classic 4-CMG pyramid skew angle (cos(beta) = 1/sqrt(3))
PYRAMID_BETA = float(np.arccos(1.0 / np.sqrt(3.0)))


def rodrigues(v: jax.Array, axis: jax.Array, angle: jax.Array) -> jax.Array:
  """Rotates v about (unit) axis by angle (Rodrigues' formula)."""
  c, s = jnp.cos(angle), jnp.sin(angle)
  return v * c + jnp.cross(axis, v) * s + axis * jnp.dot(axis, v) * (1.0 - c)


def pyramid_cluster(beta: float = PYRAMID_BETA):
  """4-CMG pyramid geometry: (gimbal_axes (4,3), spin_axes0 (4,3)).

  Gimbal axes tilt by beta from the z-axis toward the four compass points;
  spin axes at zero gimbal angle are tangential."""
  g_axes, s_axes = [], []
  for k in range(4):
    phi = k * np.pi / 2.0
    g = np.array(
        [np.sin(beta) * np.cos(phi), np.sin(beta) * np.sin(phi), np.cos(beta)]
    )
    s = np.array([-np.sin(phi), np.cos(phi), 0.0])
    g_axes.append(g)
    s_axes.append(s)
  return jnp.asarray(np.stack(g_axes)), jnp.asarray(np.stack(s_axes))


def ortho_cluster():
  """6-CMG orthogonal cluster: gimbals along ±x/±y/±z pairs."""
  g = np.array([
      [1, 0, 0], [1, 0, 0],
      [0, 1, 0], [0, 1, 0],
      [0, 0, 1], [0, 0, 1],
  ], dtype=np.float64)
  s = np.array([
      [0, 1, 0], [0, 0, 1],
      [0, 0, 1], [1, 0, 0],
      [1, 0, 0], [0, 1, 0],
  ], dtype=np.float64)
  return jnp.asarray(g), jnp.asarray(s)


def spin_axes(gimbal_axes: jax.Array, spin_axes0: jax.Array, gimbal_angles: jax.Array):
  """Spin axis of each CMG at the given gimbal angles."""
  return jax.vmap(rodrigues)(spin_axes0, gimbal_axes, gimbal_angles)


def cluster_jacobian(
    gimbal_axes: jax.Array, spin_axes0: jax.Array, gimbal_angles: jax.Array,
    h0: float = 1.0,
) -> jax.Array:
  """(3, n) torque Jacobian: column i = d(total angular momentum)/d(delta_i).

  h_i = h0 * spin_axis(delta_i); dh_i/ddelta_i = h0 * g_i x s_i(delta_i)."""
  s = spin_axes(gimbal_axes, spin_axes0, gimbal_angles)
  return (h0 * jnp.cross(gimbal_axes, s)).T


def manipulability(jac: jax.Array) -> jax.Array:
  """Singularity measure m = sqrt(det(J J^T)) (zero at gimbal lock)."""
  jjt = jac @ jac.T
  return jnp.sqrt(jnp.maximum(0.0, jnp.linalg.det(jjt)))


def momentum(gimbal_axes, spin_axes0, gimbal_angles, h0: float = 1.0):
  """Total cluster angular momentum vector."""
  return h0 * jnp.sum(spin_axes(gimbal_axes, spin_axes0, gimbal_angles), axis=0)
