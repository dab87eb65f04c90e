"""Sensors: position / velocity / acceleration stages.

Reference capability map: mujoco_torch/_src/sensor.py.  This build computes
all three stages *including* the acc-stage body/subtree sensors that the
reference silently zeroes (SURVEY.md §2.4): ACCELEROMETER/FORCE/TORQUE read
rne_postconstraint's cacc/cfrc_int, SUBTREELINVEL/SUBTREEANGMOM read
subtree_vel — both implemented in smooth.py.

Sensors iterate host-side over the static sensor table (grouping happens
implicitly — nsensor is small and XLA fuses the gathers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjtpu._src import math, support
from mjtpu._src.types import (
    Data,
    DataType,
    DisableBit,
    Model,
    ObjType,
    SensorType,
)

# mjtStage values
_STAGE_POS, _STAGE_VEL, _STAGE_ACC = 1, 2, 3


def _apply_cutoff(m: Model, i: int, val: jax.Array) -> jax.Array:
  cutoff = m.sensor_cutoff[i]
  dt = DataType(int(m.sensor_datatype[i]))
  if dt == DataType.REAL:
    return jnp.where(cutoff > 0, jnp.clip(val, -cutoff, cutoff), val)
  if dt == DataType.POSITIVE:
    return jnp.where(cutoff > 0, jnp.minimum(val, cutoff), val)
  return val


def _obj_pos_mat(m: Model, d: Data, objtype: int, objid: int):
  objtype = ObjType(objtype)
  if objtype == ObjType.BODY:
    return d.xipos[objid], d.ximat[objid]
  if objtype == ObjType.XBODY:
    return d.xpos[objid], d.xmat[objid]
  if objtype == ObjType.GEOM:
    return d.geom_xpos[objid], d.geom_xmat[objid]
  if objtype == ObjType.SITE:
    return d.site_xpos[objid], d.site_xmat[objid]
  if objtype == ObjType.CAMERA:
    return d.cam_xpos[objid], d.cam_xmat[objid]
  raise NotImplementedError(objtype)


def _obj_bodyid(m: Model, objtype: int, objid: int) -> int:
  objtype = ObjType(objtype)
  if objtype in (ObjType.BODY, ObjType.XBODY):
    return int(objid)
  if objtype == ObjType.GEOM:
    return int(m.geom_bodyid[objid])
  if objtype == ObjType.SITE:
    return int(m.site_bodyid[objid])
  if objtype == ObjType.CAMERA:
    return int(m.cam_bodyid[objid])
  raise NotImplementedError(objtype)


def _object_velocity(m: Model, d: Data, objtype: int, objid: int, local: bool):
  """6D (ang, lin) velocity of an object frame (mj_objectVelocity)."""
  pos, mat = _obj_pos_mat(m, d, objtype, objid)
  b = _obj_bodyid(m, objtype, objid)
  rc = d.subtree_com[int(m.body_rootid[b])]
  rot = mat.T if local else jnp.eye(3, dtype=pos.dtype)
  return math.transform_motion(d.cvel[b], pos - rc, rot)


def _object_acceleration(m: Model, d: Data, objtype: int, objid: int, local: bool):
  """6D (ang, lin) acceleration of an object frame (mj_objectAcceleration)."""
  pos, mat = _obj_pos_mat(m, d, objtype, objid)
  b = _obj_bodyid(m, objtype, objid)
  rc = d.subtree_com[int(m.body_rootid[b])]
  rot = mat.T if local else jnp.eye(3, dtype=pos.dtype)
  acc = math.transform_motion(d.cacc[b], pos - rc, rot)
  vel = math.transform_motion(d.cvel[b], pos - rc, rot)
  # add centripetal correction to linear part: w x v
  correction = jnp.cross(vel[:3], vel[3:])
  return acc.at[3:].add(correction)


def sensor_pos(m: Model, d: Data) -> Data:
  """Position-stage sensors (mj_sensorPos)."""
  if (m.opt.disableflags & DisableBit.SENSOR) or not m.nsensor:
    return d
  sd = d.sensordata
  for i in range(m.nsensor):
    if int(m.sensor_needstage[i]) != _STAGE_POS:
      continue
    stype = SensorType(int(m.sensor_type[i]))
    objid = int(m.sensor_objid[i])
    adr = int(m.sensor_adr[i])
    dim = int(m.sensor_dim[i])

    if stype == SensorType.MAGNETOMETER:
      val = d.site_xmat[objid].T @ m.opt.magnetic
    elif stype == SensorType.RANGEFINDER:
      from mjtpu._src import ray as ray_mod

      site_body = int(m.site_bodyid[objid])
      dist, _ = ray_mod.ray(
          m,
          d,
          d.site_xpos[objid],
          d.site_xmat[objid][:, 2],
          bodyexclude=site_body,
      )
      val = dist
    elif stype == SensorType.JOINTPOS:
      val = d.qpos[int(m.jnt_qposadr[objid])]
    elif stype == SensorType.TENDONPOS:
      val = d.ten_length[objid]
    elif stype == SensorType.ACTUATORPOS:
      val = d.actuator_length[objid]
    elif stype == SensorType.BALLQUAT:
      qadr = int(m.jnt_qposadr[objid])
      val = math.normalize(d.qpos[qadr : qadr + 4])
    elif stype == SensorType.FRAMEPOS:
      pos, _ = _obj_pos_mat(m, d, int(m.sensor_objtype[i]), objid)
      refid = int(m.sensor_refid[i])
      if refid >= 0:
        rpos, rmat = _obj_pos_mat(m, d, int(m.sensor_reftype[i]), refid)
        val = rmat.T @ (pos - rpos)
      else:
        val = pos
    elif stype in (
        SensorType.FRAMEXAXIS,
        SensorType.FRAMEYAXIS,
        SensorType.FRAMEZAXIS,
    ):
      col = {
          SensorType.FRAMEXAXIS: 0,
          SensorType.FRAMEYAXIS: 1,
          SensorType.FRAMEZAXIS: 2,
      }[stype]
      _, mat = _obj_pos_mat(m, d, int(m.sensor_objtype[i]), objid)
      axis = mat[:, col]
      refid = int(m.sensor_refid[i])
      if refid >= 0:
        _, rmat = _obj_pos_mat(m, d, int(m.sensor_reftype[i]), refid)
        axis = rmat.T @ axis
      val = axis
    elif stype == SensorType.FRAMEQUAT:
      objtype = ObjType(int(m.sensor_objtype[i]))
      if objtype == ObjType.BODY:
        quat = math.quat_mul(d.xquat[objid], m.body_iquat[objid])
      elif objtype == ObjType.XBODY:
        quat = d.xquat[objid]
      elif objtype == ObjType.GEOM:
        quat = math.quat_mul(d.xquat[int(m.geom_bodyid[objid])], m.geom_quat[objid])
      elif objtype == ObjType.SITE:
        quat = math.quat_mul(d.xquat[int(m.site_bodyid[objid])], m.site_quat[objid])
      elif objtype == ObjType.CAMERA:
        quat = math.mat_to_quat(d.cam_xmat[objid])
      else:
        raise NotImplementedError(objtype)
      refid = int(m.sensor_refid[i])
      if refid >= 0:
        reftype = ObjType(int(m.sensor_reftype[i]))
        if reftype == ObjType.BODY:
          rquat = math.quat_mul(d.xquat[refid], m.body_iquat[refid])
        elif reftype == ObjType.XBODY:
          rquat = d.xquat[refid]
        elif reftype == ObjType.GEOM:
          rquat = math.quat_mul(d.xquat[int(m.geom_bodyid[refid])], m.geom_quat[refid])
        elif reftype == ObjType.SITE:
          rquat = math.quat_mul(d.xquat[int(m.site_bodyid[refid])], m.site_quat[refid])
        else:
          rquat = math.mat_to_quat(d.cam_xmat[refid])
        quat = math.quat_mul(math.quat_inv(rquat), quat)
      val = quat
    elif stype == SensorType.SUBTREECOM:
      val = d.subtree_com[objid]
    elif stype == SensorType.CLOCK:
      val = d.time
    else:
      raise NotImplementedError(f"pos sensor {stype}")

    val = _apply_cutoff(m, i, jnp.atleast_1d(val).reshape(-1))
    sd = sd.at[adr : adr + dim].set(val.astype(sd.dtype))
  return d.replace(sensordata=sd)


def sensor_vel(m: Model, d: Data) -> Data:
  """Velocity-stage sensors (mj_sensorVel)."""
  if (m.opt.disableflags & DisableBit.SENSOR) or not m.nsensor:
    return d
  stypes = [int(t) for t in m.sensor_type]
  stages = [int(s) for s in m.sensor_needstage]
  needs_subtree = any(
      t in (SensorType.SUBTREELINVEL, SensorType.SUBTREEANGMOM)
      for t, s in zip(stypes, stages)
      if s == _STAGE_VEL
  )
  if needs_subtree:
    from mjtpu._src import smooth

    d = smooth.subtree_vel(m, d)

  sd = d.sensordata
  for i in range(m.nsensor):
    if int(m.sensor_needstage[i]) != _STAGE_VEL:
      continue
    stype = SensorType(int(m.sensor_type[i]))
    objid = int(m.sensor_objid[i])
    adr = int(m.sensor_adr[i])
    dim = int(m.sensor_dim[i])

    if stype == SensorType.VELOCIMETER:
      val = _object_velocity(m, d, ObjType.SITE, objid, local=True)[3:]
    elif stype == SensorType.GYRO:
      val = _object_velocity(m, d, ObjType.SITE, objid, local=True)[:3]
    elif stype == SensorType.JOINTVEL:
      val = d.qvel[int(m.jnt_dofadr[objid])]
    elif stype == SensorType.TENDONVEL:
      val = d.ten_velocity[objid]
    elif stype == SensorType.ACTUATORVEL:
      val = d.actuator_velocity[objid]
    elif stype == SensorType.BALLANGVEL:
      dadr = int(m.jnt_dofadr[objid])
      val = d.qvel[dadr : dadr + 3]
    elif stype == SensorType.SUBTREELINVEL:
      val = d.subtree_linvel[objid]
    elif stype == SensorType.SUBTREEANGMOM:
      val = d.subtree_angmom[objid]
    elif stype in (SensorType.FRAMELINVEL, SensorType.FRAMEANGVEL):
      objtype = int(m.sensor_objtype[i])
      vel = _object_velocity(m, d, objtype, objid, local=False)
      refid = int(m.sensor_refid[i])
      if refid >= 0:
        reftype = int(m.sensor_reftype[i])
        rvel = _object_velocity(m, d, reftype, refid, local=False)
        rpos, rmat = _obj_pos_mat(m, d, reftype, refid)
        pos, _ = _obj_pos_mat(m, d, objtype, objid)
        if stype == SensorType.FRAMELINVEL:
          # relative velocity seen from the (rotating) reference frame
          rel = vel[3:] - rvel[3:] - jnp.cross(rvel[:3], pos - rpos)
          val = rmat.T @ rel
        else:
          val = rmat.T @ (vel[:3] - rvel[:3])
      else:
        val = vel[3:] if stype == SensorType.FRAMELINVEL else vel[:3]
    else:
      raise NotImplementedError(f"vel sensor {stype}")

    val = _apply_cutoff(m, i, jnp.atleast_1d(val).reshape(-1))
    sd = sd.at[adr : adr + dim].set(val.astype(sd.dtype))
  return d.replace(sensordata=sd)


def sensor_acc(m: Model, d: Data) -> Data:
  """Acceleration-stage sensors (mj_sensorAcc)."""
  if (m.opt.disableflags & DisableBit.SENSOR) or not m.nsensor:
    return d
  stypes = [int(t) for t in m.sensor_type]
  stages = [int(s) for s in m.sensor_needstage]
  needs_rnepost = any(
      t
      in (
          SensorType.ACCELEROMETER,
          SensorType.FORCE,
          SensorType.TORQUE,
          SensorType.FRAMELINACC,
          SensorType.FRAMEANGACC,
          SensorType.TOUCH,
      )
      for t, s in zip(stypes, stages)
      if s == _STAGE_ACC
  )
  if needs_rnepost:
    from mjtpu._src import smooth

    d = smooth.rne_postconstraint(m, d)

  sd = d.sensordata
  for i in range(m.nsensor):
    if int(m.sensor_needstage[i]) != _STAGE_ACC:
      continue
    stype = SensorType(int(m.sensor_type[i]))
    objid = int(m.sensor_objid[i])
    adr = int(m.sensor_adr[i])
    dim = int(m.sensor_dim[i])

    if stype == SensorType.ACCELEROMETER:
      val = _object_acceleration(m, d, ObjType.SITE, objid, local=True)[3:]
    elif stype in (SensorType.FRAMELINACC, SensorType.FRAMEANGACC):
      acc = _object_acceleration(m, d, int(m.sensor_objtype[i]), objid, local=False)
      val = acc[3:] if stype == SensorType.FRAMELINACC else acc[:3]
    elif stype in (SensorType.FORCE, SensorType.TORQUE):
      b = int(m.site_bodyid[objid])
      rc = d.subtree_com[int(m.body_rootid[b])]
      # interaction force of body with its parent, at the site frame
      wrench = math.transform_force(
          d.cfrc_int[b], d.site_xpos[objid] - rc, d.site_xmat[objid].T
      )
      val = wrench[3:] if stype == SensorType.FORCE else wrench[:3]
    elif stype == SensorType.ACTUATORFRC:
      val = d.actuator_force[objid]
    elif stype == SensorType.JOINTACTFRC:
      val = d.qfrc_actuator[int(m.jnt_dofadr[objid])]
    elif stype == SensorType.TOUCH:
      # sum of contact normal forces on the site's body (zone test: contact
      # point inside the site volume is approximated by body membership)
      from mjtpu._src import collision_driver

      b = int(m.site_bodyid[objid])
      ncon = collision_driver.ncon(m)
      if ncon == 0:
        val = jnp.zeros((), dtype=sd.dtype)
      else:
        forces = support.contact_forces(m, d)[:, 0]
        bodyid = jnp.asarray(np.asarray(m.geom_bodyid))
        b1 = bodyid[d.contact.geom1]
        b2 = bodyid[d.contact.geom2]
        mask = ((b1 == b) | (b2 == b)).astype(sd.dtype)
        val = jnp.sum(mask * forces)
    else:
      raise NotImplementedError(f"acc sensor {stype}")

    val = _apply_cutoff(m, i, jnp.atleast_1d(val).reshape(-1))
    sd = sd.at[adr : adr + dim].set(val.astype(sd.dtype))
  return d.replace(sensordata=sd)
