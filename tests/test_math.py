"""Quaternion / spatial-algebra parity vs MuJoCo C's mju_* helpers.

Reference capability map: test/math_test.py. Each math primitive is checked
against the corresponding MuJoCo C function on random inputs at f64.
"""

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjtpu._src import math as mm

RNG = np.random.default_rng(0)


def _rand_quat(n=1):
  q = RNG.standard_normal((n, 4))
  return q / np.linalg.norm(q, axis=1, keepdims=True)


@pytest.mark.parametrize("i", range(5))
def test_quat_mul(i):
  qa, qb = _rand_quat()[0], _rand_quat()[0]
  out = np.zeros(4)
  mujoco.mju_mulQuat(out, qa, qb)
  np.testing.assert_allclose(
      np.asarray(mm.quat_mul(jnp.asarray(qa), jnp.asarray(qb))), out,
      atol=1e-14)


@pytest.mark.parametrize("i", range(5))
def test_rotate(i):
  q, v = _rand_quat()[0], RNG.standard_normal(3)
  out = np.zeros(3)
  mujoco.mju_rotVecQuat(out, v, q)
  np.testing.assert_allclose(
      np.asarray(mm.rotate(jnp.asarray(v), jnp.asarray(q))), out, atol=1e-13)
  # rotate_inv is the inverse rotation
  back = np.asarray(mm.rotate_inv(jnp.asarray(out), jnp.asarray(q)))
  np.testing.assert_allclose(back, v, atol=1e-13)


@pytest.mark.parametrize("i", range(5))
def test_quat_to_mat(i):
  q = _rand_quat()[0]
  out = np.zeros(9)
  mujoco.mju_quat2Mat(out, q)
  np.testing.assert_allclose(
      np.asarray(mm.quat_to_mat(jnp.asarray(q))), out.reshape(3, 3),
      atol=1e-14)
  # mat -> quat round trip (sign-invariant)
  q2 = np.asarray(mm.mat_to_quat(jnp.asarray(out.reshape(3, 3))))
  np.testing.assert_allclose(np.abs(q2 @ q), 1.0, atol=1e-12)


@pytest.mark.parametrize("i", range(5))
def test_axis_angle(i):
  axis = RNG.standard_normal(3)
  axis /= np.linalg.norm(axis)
  angle = RNG.uniform(-np.pi, np.pi)
  out = np.zeros(4)
  mujoco.mju_axisAngle2Quat(out, axis, angle)
  np.testing.assert_allclose(
      np.asarray(mm.axis_angle_to_quat(jnp.asarray(axis), jnp.asarray(angle))),
      out, atol=1e-14)


@pytest.mark.parametrize("i", range(5))
def test_quat_integrate(i):
  q, v = _rand_quat()[0], RNG.standard_normal(3)
  dt = 0.01
  out = q.copy()
  mujoco.mju_quatIntegrate(out, v, dt)
  got = np.asarray(
      mm.quat_integrate(jnp.asarray(q), jnp.asarray(v), jnp.asarray(dt)))
  np.testing.assert_allclose(got, out, atol=1e-13)


@pytest.mark.parametrize("i", range(5))
def test_quat_sub(i):
  qa, qb = _rand_quat()[0], _rand_quat()[0]
  out = np.zeros(3)
  mujoco.mju_subQuat(out, qa, qb)
  np.testing.assert_allclose(
      np.asarray(mm.quat_sub(jnp.asarray(qa), jnp.asarray(qb))), out,
      atol=1e-12)


def test_safe_guards():
  """norm/normalize/safe_div are finite at zero (the f32-under-jit guard
  policy — CLAUDE.md numeric-precision notes)."""
  z = jnp.zeros(3)
  assert np.isfinite(np.asarray(mm.safe_norm(z)))
  assert np.isfinite(np.asarray(mm.normalize(z))).all()
  assert np.isfinite(np.asarray(mm.safe_div(jnp.float64(1.0), jnp.float64(0.0))))


def test_cross_skew():
  v, w = RNG.standard_normal(3), RNG.standard_normal(3)
  np.testing.assert_allclose(
      np.asarray(mm.cross_skew(jnp.asarray(v))) @ w, np.cross(v, w),
      atol=1e-14)


def test_transform_motion_force_duality():
  """Motion and force transforms are adjoint: f·(X v) == (X* f)·v pattern
  preserves power across frame changes."""
  vel = RNG.standard_normal(6)
  frc = RNG.standard_normal(6)
  offset = RNG.standard_normal(3)
  q = _rand_quat()[0]
  rot = np.asarray(mm.quat_to_mat(jnp.asarray(q)))
  v2 = np.asarray(mm.transform_motion(jnp.asarray(vel), jnp.asarray(offset),
                                      jnp.asarray(rot)))
  f2 = np.asarray(mm.transform_force(jnp.asarray(frc), jnp.asarray(offset),
                                     jnp.asarray(rot)))
  np.testing.assert_allclose(v2 @ f2, vel @ frc, atol=1e-12)


def test_safe_cholesky_spd():
  a = RNG.standard_normal((6, 6))
  spd = a @ a.T + 6 * np.eye(6)
  low = np.asarray(mm.safe_cholesky(jnp.asarray(spd)))
  np.testing.assert_allclose(low @ low.T, spd, atol=1e-12)
  x = RNG.standard_normal(6)
  got = np.asarray(mm.cho_solve(jnp.asarray(low), jnp.asarray(x)))
  np.testing.assert_allclose(spd @ got, x, atol=1e-10)


def test_closest_segment_to_segment():
  """Closest points between two segments match a brute-force grid search."""
  a0, a1 = np.array([0.0, 0, 0]), np.array([1.0, 0, 0])
  b0, b1 = np.array([0.5, 1.0, 0.3]), np.array([0.5, -1.0, 0.3])
  pa, pb = mm.closest_segment_to_segment_points(
      jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(b0), jnp.asarray(b1))
  np.testing.assert_allclose(np.asarray(pa), [0.5, 0, 0], atol=1e-12)
  np.testing.assert_allclose(np.asarray(pb), [0.5, 0, 0.3], atol=1e-12)
