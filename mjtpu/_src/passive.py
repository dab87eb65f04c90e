"""Passive forces: joint/tendon spring-dampers, gravity compensation, fluid.

Reference capability map: mujoco_torch/_src/passive.py.  Semantics follow
mj_passive (spring-dampers per joint type, body gravcomp via Jacobians,
inertia-box fluid model with viscosity/density/wind).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src import math, scan, support
from mjtpu._src.types import Data, DisableBit, JointType, Model


def _spring_damper(m: Model, d: Data) -> tuple[jax.Array, jax.Array]:
  """Joint + tendon springs (qfrc_spring) and dampers (qfrc_damper)."""
  dtype = d.qpos.dtype
  qfrc_spring = jnp.zeros(m.nv, dtype=dtype)

  if m.has_jnt_spring:

    def fn(jnt_types, stiffness, qpos, qpos_spring):
      out = []
      qi = 0
      for i, jt in enumerate(jnt_types):
        jt = JointType(jt)
        if jt == JointType.FREE:
          out.append(-stiffness[i] * (qpos[qi : qi + 3] - qpos_spring[qi : qi + 3]))
          out.append(
              -stiffness[i]
              * math.quat_sub(qpos[qi + 3 : qi + 7], qpos_spring[qi + 3 : qi + 7])
          )
          qi += 7
        elif jt == JointType.BALL:
          out.append(
              -stiffness[i]
              * math.quat_sub(qpos[qi : qi + 4], qpos_spring[qi : qi + 4])
          )
          qi += 4
        else:
          out.append(
              (-stiffness[i] * (qpos[qi] - qpos_spring[qi])).reshape(1)
          )
          qi += 1
      if not out:
        return jnp.zeros(0, dtype=qpos.dtype)
      return jnp.concatenate(out)

    qfrc_spring = scan.flat(
        m,
        fn,
        "jjqq",
        "v",
        np.asarray(m.jnt_type),
        m.jnt_stiffness,
        d.qpos,
        m.qpos_spring,
    )
    if qfrc_spring is None:
      qfrc_spring = jnp.zeros(m.nv, dtype=dtype)

  qfrc_damper = -m.dof_damping * d.qvel

  # tendon springs (deadband range) and dampers
  if m.ntendon:
    if m.has_tendon_spring:
      lower, upper = m.tendon_lengthspring[:, 0], m.tendon_lengthspring[:, 1]
      displacement = jnp.where(
          d.ten_length > upper,
          upper - d.ten_length,
          jnp.where(d.ten_length < lower, lower - d.ten_length, 0.0),
      )
      frc_spring = m.tendon_stiffness * displacement
      qfrc_spring = qfrc_spring + d.ten_J.T @ frc_spring
    if m.has_tendon_damping:
      frc_damper = -m.tendon_damping * d.ten_velocity
      qfrc_damper = qfrc_damper + d.ten_J.T @ frc_damper

  return qfrc_spring, qfrc_damper


def _gravcomp(m: Model, d: Data) -> jax.Array:
  """Gravity-compensation generalized force (vectorized over bodies)."""
  mask = jnp.asarray(support.dof_ancestor_mask(m), dtype=d.qpos.dtype)
  force = -m.opt.gravity[None, :] * (m.body_mass * m.body_gravcomp)[:, None]
  offset = d.xipos - d.subtree_com[np.asarray(m.body_rootid)]
  jacp = d.cdof[None, :, 3:] + jnp.cross(d.cdof[None, :, :3], offset[:, None, :])
  return jnp.einsum("bv,bvi,bi->v", mask, jacp, force)


def _inertia_box_fluid_model(m: Model, d: Data) -> jax.Array:
  """Fluid forces via the inertia-box approximation (mj_inertiaBoxFluidModel)."""
  dtype = d.qpos.dtype

  # equivalent box dims per body from diagonal inertia
  inertia = m.body_inertia
  mass = jnp.maximum(math.MINVAL, m.body_mass)
  ix, iy, iz = inertia[:, 0], inertia[:, 1], inertia[:, 2]
  box = jnp.stack(
      [
          jnp.sqrt(jnp.maximum(math.MINVAL, (iy + iz - ix) * 6.0 / mass)),
          jnp.sqrt(jnp.maximum(math.MINVAL, (iz + ix - iy) * 6.0 / mass)),
          jnp.sqrt(jnp.maximum(math.MINVAL, (ix + iy - iz) * 6.0 / mass)),
      ],
      axis=-1,
  )  # full side lengths (nbody, 3)

  root_com = d.subtree_com[np.asarray(m.body_rootid)]

  def per_body(cvel, xipos, ximat, rc, box_b):
    # local 6D velocity at the inertial frame (rows of ximat^T = local axes)
    lvel = math.transform_motion(cvel, xipos - rc, ximat.T)
    # wind in local frame (linear only)
    lwind = ximat.T @ m.opt.wind
    lvel = lvel.at[3:].add(-lwind)
    lfrc = jnp.zeros(6, dtype=dtype)
    # viscous resistance
    diam = jnp.mean(box_b)
    lfrc = lfrc.at[:3].add(-jnp.pi * diam**3 * m.opt.viscosity * lvel[:3])
    lfrc = lfrc.at[3:].add(-3.0 * jnp.pi * diam * m.opt.viscosity * lvel[3:])
    # quadratic drag
    b0, b1, b2 = box_b[0], box_b[1], box_b[2]
    ang_scale = jnp.stack([
        b0 * (b1**4 + b2**4),
        b1 * (b0**4 + b2**4),
        b2 * (b0**4 + b1**4),
    ]) / 64.0
    lfrc = lfrc.at[:3].add(-m.opt.density * ang_scale * jnp.abs(lvel[:3]) * lvel[:3])
    lin_area = jnp.stack([b1 * b2, b0 * b2, b0 * b1])
    lfrc = lfrc.at[3:].add(
        -0.5 * m.opt.density * lin_area * jnp.abs(lvel[3:]) * lvel[3:]
    )
    # rotate force back to world (at the inertial frame origin)
    world_frc = jnp.concatenate([ximat @ lfrc[:3], ximat @ lfrc[3:]])
    return world_frc

  frc = jax.vmap(per_body)(d.cvel, d.xipos, d.ximat, root_com, box)
  frc = frc * (m.body_mass[:, None] > 0)

  # accumulate world-frame torque/force at xipos into qfrc
  mask = jnp.asarray(support.dof_ancestor_mask(m), dtype=dtype)
  offset = d.xipos - root_com
  jacp = d.cdof[None, :, 3:] + jnp.cross(d.cdof[None, :, :3], offset[:, None, :])
  qfrc = jnp.einsum("bv,bvi,bi->v", mask, jacp, frc[:, 3:])
  qfrc = qfrc + jnp.einsum("bv,vi,bi->v", mask, d.cdof[:, :3], frc[:, :3])
  return qfrc


def passive(m: Model, d: Data) -> Data:
  """Passive forces (mj_passive)."""
  dtype = d.qpos.dtype
  zero = jnp.zeros(m.nv, dtype=dtype)
  if (m.opt.disableflags & DisableBit.PASSIVE) == DisableBit.PASSIVE:
    return d.replace(
        qfrc_spring=zero,
        qfrc_damper=zero,
        qfrc_gravcomp=zero,
        qfrc_fluid=zero,
        qfrc_passive=zero,
    )

  qfrc_spring, qfrc_damper = _spring_damper(m, d)
  if m.opt.disableflags & DisableBit.SPRING:
    qfrc_spring = zero
  if m.opt.disableflags & DisableBit.DAMPER:
    qfrc_damper = zero

  qfrc_gravcomp = zero
  if m.has_gravcomp and not (m.opt.disableflags & DisableBit.GRAVITY):
    qfrc_gravcomp = _gravcomp(m, d)

  qfrc_fluid = zero
  if m.opt.has_fluid_params:
    qfrc_fluid = _inertia_box_fluid_model(m, d)

  qfrc_passive = qfrc_spring + qfrc_damper + qfrc_fluid
  # gravcomp routed through actuators (jnt_actgravcomp) is added in actuation
  actgrav_dof = np.asarray(m.jnt_actgravcomp)[np.asarray(m.dof_jntid)]
  qfrc_passive = qfrc_passive + jnp.where(
      jnp.asarray(actgrav_dof == 0), qfrc_gravcomp, 0.0
  )

  return d.replace(
      qfrc_spring=qfrc_spring,
      qfrc_damper=qfrc_damper,
      qfrc_gravcomp=qfrc_gravcomp,
      qfrc_fluid=qfrc_fluid,
      qfrc_passive=qfrc_passive,
  )
