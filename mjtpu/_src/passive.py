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


def _fluid_geoms(m: Model) -> np.ndarray:
  """Static ids of geoms with per-geom fluid coefficients (fluidshape=
  'ellipsoid'); geom_fluid[:, 0] is the compiler's interaction flag."""
  if m.geom_fluid_np is None or not m.ngeom:
    return np.zeros(0, dtype=int)
  return np.nonzero(m.geom_fluid_np[:, 0] != 0)[0]


def _geom_semiaxes(m: Model, geoms: np.ndarray) -> jax.Array:
  """(G, 3) ellipsoid semiaxes per geom (mj_geomSemiAxes): sphere (r,r,r),
  capsule (r,r,half_len+r), cylinder (r,r,half_len), ellipsoid/box = size.
  Recovered from the C oracle via the Stokes-drag equivalent diameter."""
  from mjtpu._src.types import GeomType

  gtypes = np.asarray(m.geom_type)[geoms]
  out = []
  for k in range(len(geoms)):
    s = m.geom_size[int(geoms[k])]
    t = int(gtypes[k])
    if t == GeomType.SPHERE:
      out.append(jnp.stack([s[0], s[0], s[0]]))
    elif t == GeomType.CAPSULE:
      out.append(jnp.stack([s[0], s[0], s[1] + s[0]]))
    elif t == GeomType.CYLINDER:
      out.append(jnp.stack([s[0], s[0], s[1]]))
    else:  # ellipsoid, box: semiaxes = size (half extents)
      out.append(s[:3])
  return jnp.stack(out)


def _ellipsoid_fluid_model(m: Model, d: Data, geoms: np.ndarray) -> jax.Array:
  """Per-geom ellipsoid fluid model (mj_ellipsoidFluidModel) — capability
  beyond the reference, which only has the inertia-box model.

  Every term was recovered exactly against the C oracle by isolating the
  geom_fluid coefficients (probe scripts: isolate one coefficient, fit the
  functional form to ~1e-12):

    Kirchhoff added mass  F += p×ω,  T += p×v + h×ω
                          p = ρ·m_V∘v,  h = ρ·I_V∘ω      (virtual mass/inertia)
    Stokes (viscosity β)  F -= 3π d_eq β v,  T -= π d_eq³ β ω,  d_eq = ⅔Σrᵢ
    blunt drag            F -= C_B ρ A_proj ‖v‖ v
                          A_proj = π √(Σdᵢ⁴vᵢ² / Σdᵢ²vᵢ²),  dᵢ = rⱼrₖ
    slender drag          F -= C_S ρ (A_max − A_proj) ‖v‖ v,  A_max = π r_mid r_max
    Kutta lift            F += C_K ρ π √(Σdᵢ²vᵢ²/Σdᵢ⁴vᵢ²)/‖v‖ ((n×v)×v),
                          n = d²∘v
    Magnus lift           F += C_M ρ V (ω×v),  V = 4/3 π r₁r₂r₃
    angular drag          T -= ρ ω √(Σⱼ(Mⱼωⱼ)²),
                          Mⱼ = C_A·IIⱼ + C_S·(I_max−IIⱼ),
                          IIⱼ = 8/15 π rⱼ max(rₖ,rₗ)⁴,  I_max = 8/15 π r_mid r_max⁴

  all in the geom frame with v = linear velocity of the geom center minus
  wind, ω = angular velocity."""
  dtype = d.qpos.dtype
  gbody = np.asarray(m.geom_bodyid)[geoms]
  rootid = np.asarray(m.body_rootid)[gbody]
  root_com = d.subtree_com[rootid]
  semi = _geom_semiaxes(m, geoms)
  coefs = m.geom_fluid[np.asarray(geoms)]
  pi = jnp.pi
  rho, beta = m.opt.density, m.opt.viscosity

  def per_geom(xpos, xmat, cvel, rc, r, gf):
    lvel = math.transform_motion(cvel, xpos - rc, xmat.T)
    w = lvel[:3]
    v = lvel[3:] - xmat.T @ m.opt.wind
    c_blunt, c_slender, c_ang, c_kutta, c_magnus = (
        gf[1], gf[2], gf[3], gf[4], gf[5])
    vmass, vinertia = gf[6:9], gf[9:12]

    # Kirchhoff added-mass momentum coupling (zero-acceleration terms)
    p = rho * vmass * v
    h = rho * vinertia * w
    frc = jnp.cross(p, w)
    trq = jnp.cross(p, v) + jnp.cross(h, w)

    # Stokes linear resistance at the equivalent sphere
    d_eq = (2.0 / 3.0) * jnp.sum(r)
    frc = frc - 3.0 * pi * d_eq * beta * v
    trq = trq - pi * d_eq**3 * beta * w

    dd = jnp.stack([r[1] * r[2], r[0] * r[2], r[0] * r[1]])
    s2 = jnp.sum(dd**2 * v * v)
    s4 = jnp.sum(dd**4 * v * v)
    vnorm = jnp.linalg.norm(v)
    a_proj = pi * jnp.sqrt(s4 / jnp.maximum(s2, math.MINVAL))
    rs = jnp.sort(r)
    a_max = pi * rs[1] * rs[2]
    frc = frc - rho * (
        c_blunt * a_proj + c_slender * jnp.maximum(a_max - a_proj, 0.0)
    ) * vnorm * v

    n = dd**2 * v
    kutta = pi * jnp.sqrt(s2 / jnp.maximum(s4, math.MINVAL))
    kutta = kutta / jnp.maximum(vnorm, math.MINVAL)
    frc = frc + c_kutta * rho * kutta * jnp.cross(jnp.cross(n, v), v)

    volume = (4.0 / 3.0) * pi * r[0] * r[1] * r[2]
    frc = frc + c_magnus * rho * volume * jnp.cross(w, v)

    rmax_perp = jnp.stack([
        jnp.maximum(r[1], r[2]),
        jnp.maximum(r[0], r[2]),
        jnp.maximum(r[0], r[1]),
    ])
    moi = (8.0 / 15.0) * pi * r * rmax_perp**4
    moi_max = (8.0 / 15.0) * pi * rs[1] * rs[2] ** 4
    mmix = c_ang * moi + c_slender * (moi_max - moi)
    trq = trq - rho * w * jnp.sqrt(jnp.sum((mmix * w) ** 2))

    return xmat @ frc, xmat @ trq

  fw, tw = jax.vmap(per_geom)(
      d.geom_xpos[geoms], d.geom_xmat[geoms], d.cvel[gbody], root_com,
      semi.astype(dtype), coefs.astype(dtype),
  )

  mask = jnp.asarray(support.dof_ancestor_mask(m), dtype=dtype)[gbody]
  offset = d.geom_xpos[geoms] - root_com
  jacp = d.cdof[None, :, 3:] + jnp.cross(
      d.cdof[None, :, :3], offset[:, None, :])
  qfrc = jnp.einsum("gv,gvi,gi->v", mask, jacp, fw)
  qfrc = qfrc + jnp.einsum("gv,vi,gi->v", mask, d.cdof[:, :3], tw)
  return qfrc


def _fluid(m: Model, d: Data) -> jax.Array:
  """Dispatches fluid forces per body (mj_passive): bodies with any
  fluidshape='ellipsoid' geom use the per-geom ellipsoid model; everything
  else takes the inertia-box approximation."""
  geoms = _fluid_geoms(m)
  if not len(geoms):
    return _inertia_box_fluid_model(m, d)
  ell_bodies = np.unique(np.asarray(m.geom_bodyid)[geoms])
  body_use_box = np.ones(m.nbody, dtype=bool)
  body_use_box[ell_bodies] = False
  qfrc = _ellipsoid_fluid_model(m, d, geoms)
  if body_use_box[1:].any():  # world body never contributes
    qfrc = qfrc + _inertia_box_fluid_model(m, d, body_mask=body_use_box)
  return qfrc


def _inertia_box_fluid_model(
    m: Model, d: Data, body_mask: np.ndarray | None = None
) -> jax.Array:
  """Fluid forces via the inertia-box approximation (mj_inertiaBoxFluidModel).

  `body_mask` (static bool, nbody) excludes bodies handled by the
  per-geom ellipsoid model."""
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
  if body_mask is not None:
    frc = frc * jnp.asarray(body_mask[:, None], dtype=dtype)

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
    qfrc_fluid = _fluid(m, d)

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
