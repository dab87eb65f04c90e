"""Quaternion / spatial-algebra math substrate.

MuJoCo conventions throughout: quaternions are (w, x, y, z); spatial motion
vectors are 6-vectors (angular[3], linear[3]); spatial inertias are packed
10-vectors cinert = (upper-triangular-full 3x3 inertia about CoM frame origin
[xx yy zz xy xz yz? -- see inert functions], mass*com, mass).

Reference capability map: mujoco_torch/_src/math.py (quat algebra,
small_cholesky), _src/support.py (spatial transforms).  Implementations here
are fresh, dtype-polymorphic jax.numpy — on TPU the small fixed-size ops fuse
into surrounding kernels; there is no analog of the reference's unrolled
Cholesky tricks (XLA handles small dense factorizations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# MuJoCo's mjMINVAL
MINVAL = 1e-15


def norm(x: jax.Array, axis=None) -> jax.Array:
  """Safe norm: gradient is zero (not nan) at x == 0."""
  return safe_norm(x, axis=axis)


def safe_norm(x: jax.Array, axis=None) -> jax.Array:
  sq = jnp.sum(x * x, axis=axis)
  is_zero = sq == 0.0
  sq = jnp.where(is_zero, 1.0, sq)
  return jnp.where(is_zero, 0.0, jnp.sqrt(sq))


def normalize_with_norm(x: jax.Array, axis=None):
  n = safe_norm(x, axis=axis)
  nn = jnp.where(n == 0.0, 1.0, n)
  if axis is not None:
    nn = jnp.expand_dims(nn, axis)
  return x / nn, n


def normalize(x: jax.Array, axis=None) -> jax.Array:
  return normalize_with_norm(x, axis=axis)[0]


def safe_div(a: jax.Array, b: jax.Array) -> jax.Array:
  return a / jnp.where(b == 0.0, MINVAL, b)


# ---------------------------------------------------------------------------
# quaternions
# ---------------------------------------------------------------------------


def quat_mul(u: jax.Array, v: jax.Array) -> jax.Array:
  """Hamilton product of two (w,x,y,z) quaternions."""
  return jnp.stack([
      u[0] * v[0] - u[1] * v[1] - u[2] * v[2] - u[3] * v[3],
      u[0] * v[1] + u[1] * v[0] + u[2] * v[3] - u[3] * v[2],
      u[0] * v[2] - u[1] * v[3] + u[2] * v[0] + u[3] * v[1],
      u[0] * v[3] + u[1] * v[2] - u[2] * v[1] + u[3] * v[0],
  ])


def quat_inv(q: jax.Array) -> jax.Array:
  """Conjugate of a unit quaternion."""
  return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(vec: jax.Array, quat: jax.Array) -> jax.Array:
  """Rotates vec by quat (mju_rotVecQuat)."""
  s, u = quat[0], quat[1:]
  r = 2.0 * (jnp.dot(u, vec) * u) + (s * s - jnp.dot(u, u)) * vec
  r = r + 2.0 * s * jnp.cross(u, vec)
  return r


def rotate_inv(vec: jax.Array, quat: jax.Array) -> jax.Array:
  return rotate(vec, quat_inv(quat))


def quat_to_mat(q: jax.Array) -> jax.Array:
  """Unit quaternion -> 3x3 rotation matrix."""
  w, x, y, z = q[0], q[1], q[2], q[3]
  return jnp.stack([
      jnp.stack([
          1.0 - 2.0 * (y * y + z * z),
          2.0 * (x * y - w * z),
          2.0 * (x * z + w * y),
      ]),
      jnp.stack([
          2.0 * (x * y + w * z),
          1.0 - 2.0 * (x * x + z * z),
          2.0 * (y * z - w * x),
      ]),
      jnp.stack([
          2.0 * (x * z - w * y),
          2.0 * (y * z + w * x),
          1.0 - 2.0 * (x * x + y * y),
      ]),
  ])


def mat_to_quat(m: jax.Array) -> jax.Array:
  """3x3 rotation matrix -> unit quaternion (branch-free 4-case select)."""
  # four candidate constructions, pick the one with the largest pivot
  tr = m[0, 0] + m[1, 1] + m[2, 2]

  q0 = jnp.stack(
      [tr + 1.0, m[2, 1] - m[1, 2], m[0, 2] - m[2, 0], m[1, 0] - m[0, 1]]
  )
  q1 = jnp.stack([
      m[2, 1] - m[1, 2],
      1.0 + m[0, 0] - m[1, 1] - m[2, 2],
      m[0, 1] + m[1, 0],
      m[0, 2] + m[2, 0],
  ])
  q2 = jnp.stack([
      m[0, 2] - m[2, 0],
      m[0, 1] + m[1, 0],
      1.0 - m[0, 0] + m[1, 1] - m[2, 2],
      m[1, 2] + m[2, 1],
  ])
  q3 = jnp.stack([
      m[1, 0] - m[0, 1],
      m[0, 2] + m[2, 0],
      m[1, 2] + m[2, 1],
      1.0 - m[0, 0] - m[1, 1] + m[2, 2],
  ])
  pivots = jnp.stack([tr, m[0, 0], m[1, 1], m[2, 2]])
  case = jnp.argmax(pivots)
  q = jax.lax.switch(case, [lambda: q0, lambda: q1, lambda: q2, lambda: q3])
  return normalize(q)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
  """Unit axis + angle -> quaternion."""
  s, c = jnp.sin(angle * 0.5), jnp.cos(angle * 0.5)
  return jnp.concatenate([c[None], axis * s])


def quat_integrate(q: jax.Array, v: jax.Array, dt: jax.Array) -> jax.Array:
  """Integrates quaternion by angular velocity v over dt (mju_quatIntegrate)."""
  v, angle = normalize_with_norm(v)
  q = quat_mul(q, axis_angle_to_quat(v, angle * dt))
  return normalize(q)


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
  """Velocity-space difference of two quaternions (mju_subQuat): 3-vector."""
  qdif = quat_mul(quat_inv(qb), qa)
  axis, sin_a_2 = normalize_with_norm(qdif[1:])
  speed = 2.0 * jnp.arctan2(sin_a_2, qdif[0])
  # wrap to (-pi, pi]
  speed = jnp.where(speed > jnp.pi, speed - 2.0 * jnp.pi, speed)
  return axis * speed


def quat_to_vel(q: jax.Array) -> jax.Array:
  """Quaternion -> angular-velocity-style 3-vector (axis * angle)."""
  axis, sin_a_2 = normalize_with_norm(q[1:])
  angle = 2.0 * jnp.arctan2(sin_a_2, q[0])
  angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
  return axis * angle


# ---------------------------------------------------------------------------
# spatial algebra (Featherstone 6-vectors, MuJoCo layout: [ang, lin])
# ---------------------------------------------------------------------------


def cross_skew(v: jax.Array) -> jax.Array:
  """3-vector -> skew-symmetric cross-product matrix."""
  return jnp.array([
      [0.0, -v[2], v[1]],
      [v[2], 0.0, -v[0]],
      [-v[1], v[0], 0.0],
  ])


def transform_motion(vel: jax.Array, offset: jax.Array, rotmat: jax.Array) -> jax.Array:
  """Transforms a motion 6-vector into a frame offset/rotated from it.

  Mirrors mju_transformSpatial(flg_force=0): new frame's origin is `offset`
  away, world-aligned rotation `rotmat` (rows are new-frame axes).
  """
  ang, lin = vel[:3], vel[3:]
  lin = lin - jnp.cross(offset, ang)
  ang = rotmat @ ang
  lin = rotmat @ lin
  return jnp.concatenate([ang, lin])


def transform_force(frc: jax.Array, offset: jax.Array, rotmat: jax.Array) -> jax.Array:
  """Transforms a force 6-vector (mju_transformSpatial flg_force=1)."""
  ang, lin = frc[:3], frc[3:]
  ang = ang - jnp.cross(offset, lin)
  ang = rotmat @ ang
  lin = rotmat @ lin
  return jnp.concatenate([ang, lin])


def motion_cross(u: jax.Array, v: jax.Array) -> jax.Array:
  """Cross product of two motion 6-vectors (mju_crossMotion)."""
  u_ang, u_lin = u[:3], u[3:]
  v_ang, v_lin = v[:3], v[3:]
  ang = jnp.cross(u_ang, v_ang)
  lin = jnp.cross(u_ang, v_lin) + jnp.cross(u_lin, v_ang)
  return jnp.concatenate([ang, lin])


def motion_cross_force(v: jax.Array, f: jax.Array) -> jax.Array:
  """Cross product of motion with force 6-vector (mju_crossForce)."""
  v_ang, v_lin = v[:3], v[3:]
  f_ang, f_lin = f[:3], f[3:]
  ang = jnp.cross(v_ang, f_ang) + jnp.cross(v_lin, f_lin)
  lin = jnp.cross(v_ang, f_lin)
  return jnp.concatenate([ang, lin])


def inert_mul(i: jax.Array, v: jax.Array) -> jax.Array:
  """Multiplies a packed 10-vector CoM-frame inertia by a motion 6-vector.

  Packing (matches mjData.cinert rows): i[0:6] = full inertia matrix
  (xx, yy, zz, xy, xz, yz) about the frame origin, i[6:9] = mass * com,
  i[9] = mass. Returns force 6-vector (mju_mulInertVec).
  """
  inert = jnp.array([
      [i[0], i[3], i[4]],
      [i[3], i[1], i[5]],
      [i[4], i[5], i[2]],
  ])
  h = i[6:9]  # mass * com offset
  ang = inert @ v[:3] + jnp.cross(h, v[3:])
  lin = i[9] * v[3:] - jnp.cross(h, v[:3])
  return jnp.concatenate([ang, lin])


def transform_inert(i: jax.Array, pos: jax.Array, rot: jax.Array, mass: jax.Array) -> jax.Array:
  """Builds a packed 10-vector inertia from diagonal body inertia.

  i: (3,) diagonal inertia in inertial frame; rot: inertial-frame rotation
  (3x3, world-from-inertial); pos: vector from new frame origin to body CoM
  (world coords); mass: scalar.  Result is the inertia about the new frame
  origin, packed as in :func:`inert_mul` (mirrors mj_comPos's cinert build).
  """
  inert_world = rot @ jnp.diag(i) @ rot.T
  # parallel axis theorem: I_origin = I_com + m * (pos.pos * eye - pos pos^T)
  off = mass * (jnp.dot(pos, pos) * jnp.eye(3, dtype=i.dtype) - jnp.outer(pos, pos))
  full = inert_world + off
  return jnp.concatenate([
      jnp.stack([full[0, 0], full[1, 1], full[2, 2], full[0, 1], full[0, 2], full[1, 2]]),
      mass * pos,
      mass[None] if mass.ndim == 0 else mass,
  ])


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------


def closest_segment_point(a: jax.Array, b: jax.Array, pt: jax.Array) -> jax.Array:
  """Closest point on segment ab to point pt."""
  ab = b - a
  # maximum (not +eps): XLA reassociates additive guards away at f32
  t = jnp.dot(pt - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-12)
  return a + jnp.clip(t, 0.0, 1.0) * ab


def closest_segment_point_and_dist(a, b, pt):
  p = closest_segment_point(a, b, pt)
  d = p - pt
  return p, jnp.dot(d, d)


def closest_segment_to_segment_points(a0, a1, b0, b1):
  """Closest points between two segments (a0a1, b0b1)."""
  dir_a, len_a = normalize_with_norm(a1 - a0)
  dir_b, len_b = normalize_with_norm(b1 - b0)

  half_len_a = len_a * 0.5
  half_len_b = len_b * 0.5
  a_mid = a0 + dir_a * half_len_a
  b_mid = b0 + dir_b * half_len_b

  trans = a_mid - b_mid

  dira_dot_dirb = jnp.dot(dir_a, dir_b)
  dira_dot_trans = jnp.dot(dir_a, trans)
  dirb_dot_trans = jnp.dot(dir_b, trans)
  denom = 1.0 - dira_dot_dirb * dira_dot_dirb

  # maximum (not +eps): at f32 XLA reassociates (1 - d*d) + 1e-12 into
  # (1 + 1e-12) - d*d == 1 - d*d, erasing the guard -> 0/0 for parallel
  # segments under jit (found on parallel humanoid capsules)
  orig_t_a = (-dira_dot_trans + dira_dot_dirb * dirb_dot_trans) / jnp.maximum(
      denom, 1e-12
  )
  orig_t_b = dirb_dot_trans + orig_t_a * dira_dot_dirb
  t_a = jnp.clip(orig_t_a, -half_len_a, half_len_a)
  t_b = jnp.clip(orig_t_b, -half_len_b, half_len_b)

  best_a = a_mid + dir_a * t_a
  best_b = b_mid + dir_b * t_b

  # resolve degeneracy by one more round of projection
  new_a = closest_segment_point(a0, a1, best_b)
  new_b = closest_segment_point(b0, b1, new_a)
  d_first = best_a - best_b
  d_second = new_a - new_b
  use_second = jnp.dot(d_second, d_second) < jnp.dot(d_first, d_first)
  best_a = jnp.where(use_second, new_a, best_a)
  best_b = jnp.where(use_second, new_b, best_b)
  return best_a, best_b


def make_frame(a: jax.Array) -> jax.Array:
  """Makes a right-handed 3D frame given a normal direction. Returns (3,3) with rows x(=a), y, z."""
  a = normalize(a)
  # choose a helper axis not parallel to a
  y = jnp.array([0.0, 1.0, 0.0], dtype=a.dtype)
  z = jnp.array([0.0, 0.0, 1.0], dtype=a.dtype)
  b = jnp.where((-0.5 < a[1]) & (a[1] < 0.5), y, z)
  b = b - a * jnp.dot(a, b)
  b = normalize(b)
  c = jnp.cross(a, b)
  return jnp.stack([a, b, c])


def orthogonals(a: jax.Array):
  """Returns two vectors orthogonal to a (and each other)."""
  f = make_frame(a)
  return f[1], f[2]


def safe_cholesky(a: jax.Array) -> jax.Array:
  """Lower Cholesky with pivot clamping (mirrors MuJoCo's factorization and
  the reference's small_cholesky pivot guard, math.py:96-128): singular mass
  matrices (massless dof chains) factor to large-but-finite results instead
  of NaN.  Right-looking outer-product form; batches cleanly under vmap."""
  n = a.shape[-1]
  if n == 0:  # static-only model (nv=0): nothing to factor
    return a
  # dtype-aware pivot floor: 1e-15 preserves f64 oracle parity; f32 needs a
  # larger floor or 1/sqrt(pivot) overflows downstream
  floor = MINVAL if a.dtype == jnp.float64 else 1e-9

  def body(j, carry):
    mat, low = carry
    pivot = jnp.maximum(floor, mat[j, j])
    d = jnp.sqrt(pivot)
    below = jnp.arange(n) > j
    col = jnp.where(below, mat[:, j] / d, 0.0)
    col = col.at[j].set(d)
    low = low.at[:, j].set(col)
    mat = mat - jnp.outer(col, col)
    return mat, low

  _, low = jax.lax.fori_loop(0, n, body, (a, jnp.zeros_like(a)))
  return low


def cho_solve(low: jax.Array, b: jax.Array) -> jax.Array:
  """Solves A x = b given the (clamped) lower Cholesky factor of A."""
  b2 = b[..., None] if b.ndim == low.ndim - 1 else b
  y = jax.lax.linalg.triangular_solve(
      low, b2, left_side=True, lower=True, transpose_a=False
  )
  x = jax.lax.linalg.triangular_solve(
      low, y, left_side=True, lower=True, transpose_a=True
  )
  return x[..., 0] if b.ndim == low.ndim - 1 else x


def random_unit_quat(key: jax.Array, shape=()) -> jax.Array:
  """Uniformly distributed unit quaternions (reference random_unit_quat)."""
  u = jax.random.uniform(key, shape + (3,))
  r1 = jnp.sqrt(1.0 - u[..., 0])
  r2 = jnp.sqrt(u[..., 0])
  t1 = 2.0 * jnp.pi * u[..., 1]
  t2 = 2.0 * jnp.pi * u[..., 2]
  return jnp.stack(
      [r2 * jnp.cos(t2), r1 * jnp.sin(t1), r1 * jnp.cos(t1), r2 * jnp.sin(t2)],
      axis=-1,
  )


def sigmoid_blend(s, a, b, sharpness):
  """Smooth ``where(s > 0, a, b)``: sigmoid(k·s)·a + (1−sigmoid)·b.

  Used by the collision functions under ``differentiable_mode`` with
  ``smooth_collisions`` (reference diff_config smooth case-blending) so
  case switches stay differentiable across the transition.
  """
  w = jax.nn.sigmoid(sharpness * s)
  if hasattr(a, "ndim") and a.ndim > getattr(s, "ndim", 0):
    w = jnp.expand_dims(w, tuple(range(getattr(s, "ndim", 0), a.ndim)))
  return w * a + (1.0 - w) * b
