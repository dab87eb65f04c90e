"""Sensors: position / velocity / acceleration stages.

Reference capability map: mujoco_torch/_src/sensor.py.  This build computes
all three stages *including* the acc-stage body/subtree sensors that the
reference silently zeroes (SURVEY.md §2.4): ACCELEROMETER/FORCE/TORQUE read
rne_postconstraint's cacc/cfrc_int, SUBTREELINVEL/SUBTREEANGMOM read
subtree_vel — both implemented in smooth.py.

Sensors are grouped at trace time by (type, objtype, reftype, datatype,
dim) — the TPU analog of the reference's sensor-group precompute
(reference device.py:381-585): each group runs as ONE batched gather /
compute / scatter, so graph and compile size stay flat in nsensor.  The
only per-sensor unroll left is RANGEFINDER, whose bodyexclude drives
static geom filtering inside ray().
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
    EnableBit,
    Model,
    ObjType,
    SensorType,
    TrnType,
)

# mjtStage values
_STAGE_POS, _STAGE_VEL, _STAGE_ACC = 1, 2, 3

_NO_REF = -2  # reftype placeholder for sensors without a reference frame


def _groups(m: Model, stage: int):
  """Sensors of one stage grouped by type signature, in model order.

  Key = (type, objtype, reftype-or-_NO_REF, datatype, dim); value = list of
  sensor indices.  Everything in the key is trace-time static, so each
  group lowers to one batched computation."""
  out: dict = {}
  for i in range(m.nsensor):
    if int(m.sensor_needstage[i]) != stage:
      continue
    key = (
        int(m.sensor_type[i]),
        int(m.sensor_objtype[i]),
        int(m.sensor_reftype[i]) if int(m.sensor_refid[i]) >= 0 else _NO_REF,
        int(m.sensor_datatype[i]),
        int(m.sensor_dim[i]),
    )
    out.setdefault(key, []).append(i)
  return out.items()


def _write(m: Model, sd, ids, dim, datatype, vals):
  """Cutoff-clamps a group's (K, dim) values and scatters into sensordata
  at static flat indices."""
  vals = vals.reshape(len(ids), dim)
  cut = m.sensor_cutoff[np.asarray(ids)][:, None]
  dt = DataType(datatype)
  if dt == DataType.REAL:
    vals = jnp.where(cut > 0, jnp.clip(vals, -cut, cut), vals)
  elif dt == DataType.POSITIVE:
    vals = jnp.where(cut > 0, jnp.minimum(vals, cut), vals)
  adr = np.asarray(m.sensor_adr)[np.asarray(ids)]
  flat = (adr[:, None] + np.arange(dim)[None, :]).reshape(-1)
  return sd.at[flat].set(vals.reshape(-1).astype(sd.dtype))


def _obj_pos_mat(m: Model, d: Data, objtype: int, ids: np.ndarray):
  """Batched (pos (K,3), mat (K,3,3)) of object frames of one type."""
  objtype = ObjType(objtype)
  if objtype == ObjType.BODY:
    return d.xipos[ids], d.ximat[ids]
  if objtype == ObjType.XBODY:
    return d.xpos[ids], d.xmat[ids]
  if objtype == ObjType.GEOM:
    return d.geom_xpos[ids], d.geom_xmat[ids]
  if objtype == ObjType.SITE:
    return d.site_xpos[ids], d.site_xmat[ids]
  if objtype == ObjType.CAMERA:
    return d.cam_xpos[ids], d.cam_xmat[ids]
  raise NotImplementedError(objtype)


def _obj_bodyid(m: Model, objtype: int, ids: np.ndarray) -> np.ndarray:
  objtype = ObjType(objtype)
  if objtype in (ObjType.BODY, ObjType.XBODY):
    return np.asarray(ids)
  if objtype == ObjType.GEOM:
    return np.asarray(m.geom_bodyid)[ids]
  if objtype == ObjType.SITE:
    return np.asarray(m.site_bodyid)[ids]
  if objtype == ObjType.CAMERA:
    return np.asarray(m.cam_bodyid)[ids]
  raise NotImplementedError(objtype)


def _limit_efc_rows(m: Model, ids: np.ndarray, tendon: bool) -> np.ndarray:
  """Static efc row indices (K, 2) of each joint's/tendon's limit rows,
  -1 when the model emits none (unlimited object, or limits disabled).

  Limit rows sit after the ne equality and nf friction rows, limited joints
  in joint order then limited tendons (constraint._limit_rows layout):
  scalar joints/tendons whose range is narrower than 2*margin get TWO rows
  (lower then upper — C emits both sides at once only then), everything
  else one (the second slot repeats it).  Rows exist statically; C
  materializes each only when its side's dist < margin, so readers also
  gate on efc_pos < 0."""
  from mjtpu._src.types import JointType

  ne, nf, nl, _ = support.count_constraints(m)
  rows = np.full((len(ids), 2), -1)
  if nl == 0:
    return rows
  limited_j = np.nonzero(np.asarray(m.jnt_limited))[0]
  jt = np.asarray(m.jnt_type)
  two_j = np.asarray(m.jnt_limit_two_sided)
  # per-joint starting row + row count in the static layout
  start, starts, counts = ne + nf, {}, {}
  for j in limited_j:
    n = 2 if (jt[j] != int(JointType.BALL) and two_j[j]) else 1
    starts[j], counts[j] = start, n
    start += n
  if tendon:
    nper = support.tendon_limit_rows_per(m)
    lookup = {}
    for k, t in enumerate(np.nonzero(np.asarray(m.tendon_limited))[0]):
      lookup[t] = (start + nper * k, nper)
  else:
    lookup = {j: (starts[j], counts[j]) for j in limited_j}
  for k, i in enumerate(np.asarray(ids)):
    if int(i) in lookup:
      s, n = lookup[int(i)]
      rows[k] = (s, s + n - 1)
  return rows


def _limit_read(m: Model, d: Data, ids, tendon: bool, field) -> jax.Array:
  """C's limit sensors read the FIRST materialized efc row of the object
  (rows exist in C only when that side's dist < margin): select the lower
  row when active, else the upper, else 0.

  mjtpu's efc_pos already stores dist - margin for limit rows (the value C
  exposes as efc_pos - efc_margin), so no further margin adjustment here."""
  rows = _limit_efc_rows(m, ids, tendon)
  ok = rows[:, 0] >= 0
  r_lo = np.where(ok, rows[:, 0], 0)
  r_hi = np.where(ok, rows[:, 1], 0)
  pos_lo, pos_hi = d.efc_pos[r_lo], d.efc_pos[r_hi]
  lo_active = jnp.asarray(ok) & (pos_lo < 0)
  hi_active = jnp.asarray(ok) & (pos_hi < 0)
  r = jnp.where(lo_active, r_lo, r_hi)
  pos = jnp.where(lo_active, pos_lo, pos_hi)
  return jnp.where(lo_active | hi_active, field(r, pos), 0.0)


def _subtree_bodies(m: Model, root: int) -> np.ndarray:
  """Static (nbody,) bool mask of the kinematic subtree rooted at `root`."""
  parent = np.asarray(m.body_parentid)
  mask = np.zeros(parent.shape[0], bool)
  for b in range(parent.shape[0]):
    i = b
    while True:
      if i == root:
        mask[b] = True
        break
      if i == 0:
        break
      i = int(parent[i])
  mask[root] = True
  return mask


def _points_in_site(m: Model, d: Data, site: int, p: jax.Array) -> jax.Array:
  """(N,) bool: which world points lie inside the site's volume (the
  INSIDESITE / contact-sensor `site` zone test)."""
  from mjtpu._src.types import GeomType

  q = (p - d.site_xpos[site]) @ d.site_xmat[site]  # R^T (p - t), batched
  s = m.site_size[site]
  t = int(np.asarray(m.site_type)[site])
  if t == int(GeomType.SPHERE):
    return jnp.sum(q * q, axis=-1) <= s[0] * s[0]
  if t == int(GeomType.CAPSULE):
    z = jnp.clip(q[..., 2], -s[1], s[1])
    dd = q - jnp.array([0.0, 0.0, 1.0], q.dtype) * z[..., None]
    return jnp.sum(dd * dd, axis=-1) <= s[0] * s[0]
  if t == int(GeomType.ELLIPSOID):
    r = q / jnp.asarray(s, q.dtype)
    return jnp.sum(r * r, axis=-1) <= 1.0
  if t == int(GeomType.CYLINDER):
    return (jnp.abs(q[..., 2]) <= s[1]) & (
        q[..., 0] ** 2 + q[..., 1] ** 2 <= s[0] * s[0]
    )
  # BOX
  return jnp.all(jnp.abs(q) <= jnp.asarray(s, q.dtype), axis=-1)


# CONTACT sensor dataspec bits, in slot order (oracle-probed: the compiler
# packs m.sensor_intprm = [dataspec, reduce, num])
_CONTACT_FIELDS = (
    (1, "found", 1),
    (2, "force", 3),
    (4, "torque", 3),
    (8, "dist", 1),
    (16, "pos", 3),
    (32, "normal", 3),
    (64, "tangent", 3),
)
_CONTACT_REDUCE_NONE, _CONTACT_MINDIST, _CONTACT_MAXFORCE, _CONTACT_NETFORCE = (
    0, 1, 2, 3,
)


def _rot(mat, local: bool, k: int, dtype):
  if local:
    return mat.transpose(0, 2, 1)
  return jnp.broadcast_to(jnp.eye(3, dtype=dtype), (k, 3, 3))


def _object_velocity(m, d, objtype, ids, local):
  """Batched 6D (ang, lin) velocities of object frames (mj_objectVelocity)."""
  pos, mat = _obj_pos_mat(m, d, objtype, ids)
  b = _obj_bodyid(m, objtype, ids)
  rc = d.subtree_com[np.asarray(m.body_rootid)[b]]
  rot = _rot(mat, local, len(b), pos.dtype)
  return jax.vmap(math.transform_motion)(d.cvel[b], pos - rc, rot)


def _object_acceleration(m, d, objtype, ids, local):
  """Batched 6D accelerations of object frames (mj_objectAcceleration)."""
  pos, mat = _obj_pos_mat(m, d, objtype, ids)
  b = _obj_bodyid(m, objtype, ids)
  rc = d.subtree_com[np.asarray(m.body_rootid)[b]]
  rot = _rot(mat, local, len(b), pos.dtype)
  acc = jax.vmap(math.transform_motion)(d.cacc[b], pos - rc, rot)
  vel = jax.vmap(math.transform_motion)(d.cvel[b], pos - rc, rot)
  # add centripetal correction to linear part: w x v
  correction = jnp.cross(vel[:, :3], vel[:, 3:])
  acc = acc.at[:, 3:].add(correction)
  # objects in the WORLD's weld subtree read zero, even though their cacc
  # carries the -gravity base (oracle-probed: a welded-to-world
  # accelerometer reads 0 in C while cacc shows +g; a body welded to a
  # moving body follows its cacc normally)
  static = np.asarray(m.body_weldid)[b] == 0
  if static.any():
    acc = jnp.where(jnp.asarray(static)[:, None], 0.0, acc)
  return acc


def _inside_site(m: Model, ids: np.ndarray, local: jax.Array) -> jax.Array:
  """(S, ncon) bool: is each point (site-local coords) inside each site's
  volume — the TOUCH sensor zone test (mju_insideGeom semantics).  Site
  types are static; sizes are traced."""
  from mjtpu._src.types import GeomType

  stypes = np.asarray(m.site_type)[ids]
  size = m.site_size[ids]  # (S, 3)
  out = []
  for k, st in enumerate(stypes):
    p = local[k]                       # (ncon, 3)
    s0, s1, s2 = size[k, 0], size[k, 1], size[k, 2]
    st = GeomType(int(st))
    if st == GeomType.SPHERE:
      ins = jnp.sum(p * p, axis=1) <= s0 * s0
    elif st == GeomType.CAPSULE:
      z = jnp.clip(p[:, 2], -s1, s1)
      dd = p[:, 0] ** 2 + p[:, 1] ** 2 + (p[:, 2] - z) ** 2
      ins = dd <= s0 * s0
    elif st == GeomType.ELLIPSOID:
      q = p / jnp.stack([s0, s1, s2])
      ins = jnp.sum(q * q, axis=1) <= 1.0
    elif st == GeomType.CYLINDER:
      ins = (jnp.abs(p[:, 2]) <= s1) & (
          p[:, 0] ** 2 + p[:, 1] ** 2 <= s0 * s0
      )
    elif st == GeomType.BOX:
      ins = (
          (jnp.abs(p[:, 0]) <= s0)
          & (jnp.abs(p[:, 1]) <= s1)
          & (jnp.abs(p[:, 2]) <= s2)
      )
    else:
      raise NotImplementedError(f"touch zone for site type {st}")
    out.append(ins)
  return jnp.stack(out)


def _frame_quat(m: Model, d: Data, objtype: int, ids: np.ndarray):
  """Batched frame quaternions per object type (FRAMEQUAT semantics)."""
  objtype = ObjType(objtype)
  v_qmul = jax.vmap(math.quat_mul)
  if objtype == ObjType.BODY:
    return v_qmul(d.xquat[ids], m.body_iquat[ids])
  if objtype == ObjType.XBODY:
    return d.xquat[ids]
  if objtype == ObjType.GEOM:
    return v_qmul(d.xquat[np.asarray(m.geom_bodyid)[ids]], m.geom_quat[ids])
  if objtype == ObjType.SITE:
    return v_qmul(d.xquat[np.asarray(m.site_bodyid)[ids]], m.site_quat[ids])
  if objtype == ObjType.CAMERA:
    return jax.vmap(math.mat_to_quat)(d.cam_xmat[ids])
  raise NotImplementedError(objtype)


def _rotate_into(rmat, vec):
  """(K,) batched rmat.T @ vec."""
  return jnp.einsum("kij,ki->kj", rmat, vec)


_AXIS_COL = {
    SensorType.FRAMEXAXIS: 0,
    SensorType.FRAMEYAXIS: 1,
    SensorType.FRAMEZAXIS: 2,
}


def sensor_pos(m: Model, d: Data) -> Data:
  """Position-stage sensors (mj_sensorPos)."""
  if (m.opt.disableflags & DisableBit.SENSOR) or not m.nsensor:
    return d
  sd = d.sensordata
  energy = d.energy
  for key, ids in _groups(m, _STAGE_POS):
    stype, objtype, reftype, datatype, dim = key
    stype = SensorType(stype)
    objid = np.asarray(m.sensor_objid)[ids]
    refid = np.asarray(m.sensor_refid)[ids]
    has_ref = reftype != _NO_REF

    if stype == SensorType.MAGNETOMETER:
      val = jnp.einsum("kij,i->kj", d.site_xmat[objid], m.opt.magnetic)
    elif stype == SensorType.RANGEFINDER:
      from mjtpu._src import ray as ray_mod

      dists = []
      for oid in objid:
        dist, _ = ray_mod.ray(
            m,
            d,
            d.site_xpos[oid],
            d.site_xmat[oid][:, 2],
            bodyexclude=int(m.site_bodyid[oid]),
        )
        dists.append(dist)
      val = jnp.stack(dists)
    elif stype == SensorType.JOINTPOS:
      val = d.qpos[np.asarray(m.jnt_qposadr)[objid]]
    elif stype == SensorType.TENDONPOS:
      val = d.ten_length[objid]
    elif stype == SensorType.ACTUATORPOS:
      val = d.actuator_length[objid]
    elif stype == SensorType.BALLQUAT:
      qadr = np.asarray(m.jnt_qposadr)[objid]
      val = jax.vmap(math.normalize)(d.qpos[qadr[:, None] + np.arange(4)])
    elif stype == SensorType.FRAMEPOS:
      pos, _ = _obj_pos_mat(m, d, objtype, objid)
      if has_ref:
        rpos, rmat = _obj_pos_mat(m, d, reftype, refid)
        val = _rotate_into(rmat, pos - rpos)
      else:
        val = pos
    elif stype in _AXIS_COL:
      _, mat = _obj_pos_mat(m, d, objtype, objid)
      axis = mat[:, :, _AXIS_COL[stype]]
      if has_ref:
        _, rmat = _obj_pos_mat(m, d, reftype, refid)
        axis = _rotate_into(rmat, axis)
      val = axis
    elif stype == SensorType.FRAMEQUAT:
      quat = _frame_quat(m, d, objtype, objid)
      if has_ref:
        rquat = _frame_quat(m, d, reftype, refid)
        quat = jax.vmap(math.quat_mul)(jax.vmap(math.quat_inv)(rquat), quat)
      val = quat
    elif stype == SensorType.SUBTREECOM:
      val = d.subtree_com[objid]
    elif stype == SensorType.CLOCK:
      val = jnp.broadcast_to(d.time, (len(ids),))
    elif stype in (
        SensorType.GEOMDIST, SensorType.GEOMNORMAL, SensorType.GEOMFROMTO
    ):
      # mj_geomDistance semantics: distmax = sensor cutoff; geom-or-body
      # operands (body = min over its geoms' pairs); dist clamps at distmax
      # with zero normal/fromto when nothing is below distmax
      def expand(otype, i):
        if ObjType(otype) == ObjType.GEOM:
          return [int(i)]
        adr, num = int(m.body_geomadr[i]), int(m.body_geomnum[i])
        return list(range(adr, adr + num))

      vals = []
      for k, sidx in enumerate(ids):
        distmax = m.sensor_cutoff[sidx].astype(sd.dtype)
        dmin = distmax
        ft = jnp.zeros(6, sd.dtype)
        for ga in expand(objtype, objid[k]):
          for gb in expand(reftype, refid[k]):
            dk, ftk = support.geom_distance(m, d, ga, gb, distmax)
            better = dk < dmin
            ft = jnp.where(better, ftk, ft)
            dmin = jnp.minimum(dmin, dk)
        if stype == SensorType.GEOMDIST:
          vals.append(dmin[None])
        elif stype == SensorType.GEOMFROMTO:
          vals.append(ft)
        else:
          n = ft[3:] - ft[:3]
          norm = jnp.linalg.norm(n)
          vals.append(
              jnp.where(norm > 1e-15, n / jnp.maximum(norm, 1e-15), 0.0)
          )
      val = jnp.stack(vals)
    elif stype == SensorType.INSIDESITE:
      # 1.0 when the object's frame position lies inside the reference
      # site's volume (site local-frame point-in-primitive test)
      from mjtpu._src.types import GeomType

      p, _ = _obj_pos_mat(m, d, objtype, objid)
      sp, smat = d.site_xpos[refid], d.site_xmat[refid]
      q = jnp.einsum("kij,ki->kj", smat, p - sp)  # R^T (p - t)
      size = m.site_size[refid]
      st = np.asarray(m.site_type)[refid]
      inside = []
      for k in range(len(ids)):
        t, s, qq = int(st[k]), size[k], q[k]
        if t == int(GeomType.SPHERE):
          ins = jnp.sum(qq * qq) <= s[0] * s[0]
        elif t == int(GeomType.CAPSULE):
          z = jnp.clip(qq[2], -s[1], s[1])
          dd = qq - jnp.array([0.0, 0.0, 1.0], qq.dtype) * z
          ins = jnp.sum(dd * dd) <= s[0] * s[0]
        elif t == int(GeomType.ELLIPSOID):
          r = qq / jnp.asarray(s, qq.dtype)
          ins = jnp.sum(r * r) <= 1.0
        elif t == int(GeomType.CYLINDER):
          ins = (jnp.abs(qq[2]) <= s[1]) & (
              qq[0] * qq[0] + qq[1] * qq[1] <= s[0] * s[0]
          )
        else:  # BOX
          ins = jnp.all(jnp.abs(qq) <= jnp.asarray(s, qq.dtype))
        inside.append(ins)
      val = jnp.stack(inside).astype(sd.dtype)
    elif stype == SensorType.CAMPROJECTION:
      # target site in camera pixel coordinates.  Oracle-probed: the
      # principal point (cam_intrinsic[2:]) is ignored; focal comes from
      # intrinsic/sensorsize when sensorsize is set, else from fovy.
      cam = refid
      res = np.asarray(m.cam_resolution)[cam].astype(np.float64)
      ss = np.asarray(m.cam_sensorsize)[cam]
      intr = np.asarray(m.cam_intrinsic)[cam]
      fovy_f = 0.5 * res[:, 1] / np.tan(
          np.deg2rad(np.asarray(m.cam_fovy)[cam]) / 2
      )
      has_ss = ss[:, 0] > 0
      fx = np.where(
          has_ss, intr[:, 0] / np.where(has_ss, ss[:, 0], 1.0) * res[:, 0],
          fovy_f,
      )
      fy = np.where(
          has_ss, intr[:, 1] / np.where(has_ss, ss[:, 1], 1.0) * res[:, 1],
          fovy_f,
      )
      # p = R^T (site - cam): camera looks along -z
      p = jnp.einsum(
          "kij,ki->kj", d.cam_xmat[cam], d.site_xpos[objid] - d.cam_xpos[cam]
      )
      u = -p[:, 0] / p[:, 2] * fx + res[:, 0] / 2
      v = p[:, 1] / p[:, 2] * fy + res[:, 1] / 2
      val = jnp.stack([u, v], axis=-1)
    elif stype in (SensorType.JOINTLIMITPOS, SensorType.TENDONLIMITPOS):
      val = _limit_read(
          m, d, objid, stype == SensorType.TENDONLIMITPOS,
          lambda r, pos: pos,
      )
    elif stype == SensorType.E_POTENTIAL:
      # like C, the sensor runs mj_energyPos and updates d.energy as a
      # side effect even when EnableBit.ENERGY is off
      from mjtpu._src import smooth

      pe = smooth.potential_energy(m, d)
      energy = energy.at[0].set(pe)
      val = jnp.broadcast_to(pe, (len(ids),))
    elif stype == SensorType.E_KINETIC:
      # needstage is POS in C (qM and qvel are both available here).
      # Oracle-probed lazy-eval semantics (d->flg_energyvel): with
      # EnableBit.ENERGY set, mj_energyVel runs in fwd_velocity AFTER
      # sensor_pos, so the sensor reports the PREVIOUS step's kinetic
      # energy (fresh only on the very first call, when the flag is
      # clear); without the enable flag the sensor computes it fresh and
      # writes d.energy[1] itself.
      from mjtpu._src import smooth

      if m.opt.enableflags & EnableBit.ENERGY:
        ke = smooth.kinetic_energy(m, d)
        # energy[1] == 0.0 stands in for C's never-computed flag state
        # (make_data zeros it); a stale KE of exactly 0.0 with nonzero
        # current KE is the one unreproduced corner
        val = jnp.broadcast_to(
            jnp.where(d.energy[1] == 0.0, ke, d.energy[1]), (len(ids),)
        )
      else:
        ke = smooth.kinetic_energy(m, d)
        energy = energy.at[1].set(ke)
        val = jnp.broadcast_to(ke, (len(ids),))
    else:
      raise NotImplementedError(f"pos sensor {stype}")

    sd = _write(m, sd, ids, dim, datatype, val)
  return d.replace(sensordata=sd, energy=energy)


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
  for key, ids in _groups(m, _STAGE_VEL):
    stype, objtype, reftype, datatype, dim = key
    stype = SensorType(stype)
    objid = np.asarray(m.sensor_objid)[ids]
    refid = np.asarray(m.sensor_refid)[ids]
    has_ref = reftype != _NO_REF

    if stype == SensorType.VELOCIMETER:
      val = _object_velocity(m, d, ObjType.SITE, objid, local=True)[:, 3:]
    elif stype == SensorType.GYRO:
      val = _object_velocity(m, d, ObjType.SITE, objid, local=True)[:, :3]
    elif stype == SensorType.JOINTVEL:
      val = d.qvel[np.asarray(m.jnt_dofadr)[objid]]
    elif stype == SensorType.TENDONVEL:
      val = d.ten_velocity[objid]
    elif stype == SensorType.ACTUATORVEL:
      val = d.actuator_velocity[objid]
    elif stype == SensorType.BALLANGVEL:
      dadr = np.asarray(m.jnt_dofadr)[objid]
      val = d.qvel[dadr[:, None] + np.arange(3)]
    elif stype == SensorType.SUBTREELINVEL:
      val = d.subtree_linvel[objid]
    elif stype == SensorType.SUBTREEANGMOM:
      val = d.subtree_angmom[objid]
    elif stype in (SensorType.FRAMELINVEL, SensorType.FRAMEANGVEL):
      vel = _object_velocity(m, d, objtype, objid, local=False)
      if has_ref:
        rvel = _object_velocity(m, d, reftype, refid, local=False)
        rpos, rmat = _obj_pos_mat(m, d, reftype, refid)
        pos, _ = _obj_pos_mat(m, d, objtype, objid)
        if stype == SensorType.FRAMELINVEL:
          # relative velocity seen from the (rotating) reference frame
          rel = vel[:, 3:] - rvel[:, 3:] - jnp.cross(rvel[:, :3], pos - rpos)
          val = _rotate_into(rmat, rel)
        else:
          val = _rotate_into(rmat, vel[:, :3] - rvel[:, :3])
      else:
        val = vel[:, 3:] if stype == SensorType.FRAMELINVEL else vel[:, :3]
    elif stype in (SensorType.JOINTLIMITVEL, SensorType.TENDONLIMITVEL):
      val = _limit_read(
          m, d, objid, stype == SensorType.TENDONLIMITVEL,
          lambda r, pos: d.efc_J[r] @ d.qvel,
      )
    else:
      raise NotImplementedError(f"vel sensor {stype}")

    sd = _write(m, sd, ids, dim, datatype, val)
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
  for key, ids in _groups(m, _STAGE_ACC):
    stype, objtype, reftype, datatype, dim = key
    stype = SensorType(stype)
    objid = np.asarray(m.sensor_objid)[ids]

    if stype == SensorType.ACCELEROMETER:
      val = _object_acceleration(m, d, ObjType.SITE, objid, local=True)[:, 3:]
    elif stype in (SensorType.FRAMELINACC, SensorType.FRAMEANGACC):
      acc = _object_acceleration(m, d, objtype, objid, local=False)
      val = acc[:, 3:] if stype == SensorType.FRAMELINACC else acc[:, :3]
    elif stype in (SensorType.FORCE, SensorType.TORQUE):
      b = np.asarray(m.site_bodyid)[objid]
      rc = d.subtree_com[np.asarray(m.body_rootid)[b]]
      # interaction force of body with its parent, at the site frame
      wrench = jax.vmap(math.transform_force)(
          d.cfrc_int[b],
          d.site_xpos[objid] - rc,
          d.site_xmat[objid].transpose(0, 2, 1),
      )
      val = wrench[:, 3:] if stype == SensorType.FORCE else wrench[:, :3]
    elif stype == SensorType.ACTUATORFRC:
      val = d.actuator_force[objid]
    elif stype == SensorType.TENDONACTFRC:
      # total actuator force applied to each tendon: sum of actuator_force
      # over actuators with TENDON transmission targeting that tendon
      trn = np.asarray(m.actuator_trntype) == int(TrnType.TENDON)
      trnid = np.asarray(m.actuator_trnid)[:, 0]
      mask = jnp.asarray(
          (trn[None, :] & (trnid[None, :] == np.asarray(objid)[:, None]))
          .astype(np.float64)
      ).astype(sd.dtype)
      val = mask @ d.actuator_force
    elif stype == SensorType.JOINTACTFRC:
      val = d.qfrc_actuator[np.asarray(m.jnt_dofadr)[objid]]
    elif stype in (SensorType.JOINTLIMITFRC, SensorType.TENDONLIMITFRC):
      val = _limit_read(
          m, d, objid, stype == SensorType.TENDONLIMITFRC,
          lambda r, pos: d.efc_force[r],
      )
    elif stype == SensorType.TOUCH:
      # sum of contact normal forces on each site's body, gated on the
      # contact point lying INSIDE the site volume (C's zone test,
      # oracle-probed: a box site covering one end of a capsule reads only
      # that end's contact force)
      from mjtpu._src import collision_driver

      b = np.asarray(m.site_bodyid)[objid]
      ncon = collision_driver.ncon(m)
      if ncon == 0:
        val = jnp.zeros((len(ids),), dtype=sd.dtype)
      else:
        forces = support.contact_forces(m, d)[:, 0]
        bodyid = jnp.asarray(np.asarray(m.geom_bodyid))
        b1 = bodyid[d.contact.geom1]
        b2 = bodyid[d.contact.geom2]
        bk = jnp.asarray(b)[:, None]
        member = (b1[None, :] == bk) | (b2[None, :] == bk)  # (S, ncon)
        # contact pos in each site's local frame: (S, ncon, 3)
        rel = d.contact.pos[None, :, :] - d.site_xpos[objid][:, None, :]
        local = jnp.einsum("sji,scj->sci", d.site_xmat[objid], rel)
        inside = _inside_site(m, objid, local)
        val = jnp.sum(
            jnp.where(member & inside, forces[None, :], 0.0), axis=1
        ).astype(sd.dtype)
    elif stype == SensorType.CONTACT:
      sd = _contact_sensor(m, d, sd, ids)
      continue  # writes directly: C applies NO cutoff to CONTACT
    else:
      raise NotImplementedError(f"acc sensor {stype}")

    sd = _write(m, sd, ids, dim, datatype, val)
  return d.replace(sensordata=sd)


def _contact_sensor(m: Model, d: Data, sd: jax.Array, ids) -> jax.Array:
  """mjSENS_CONTACT (MuJoCo 3.3+): match contacts against the sensor's
  criteria, orient each so the first matched object is object-1, then
  write `num` slots of the selected data fields, optionally reduced.

  Oracle-probed semantics (no reference counterpart — capability-plus):
  - criteria: geom/body (any geom of the body) / subtree (mjOBJ_XBODY) are
    SIDED; `site` is a volumetric whole-contact test on contact.pos (the
    site's volume, like INSIDESITE).  Two sided criteria must match
    opposite sides; one matches either side.
  - flipping a contact negates normal and tangent (frame rows 0 and 1) and
    the t2 components of force/torque: reported force is "applied by
    object-1 onto object-2" in the (possibly flipped) contact frame.
  - `found` = TOTAL number of matches, written only into filled slots.
  - reduce: none (first `num` matches in contact order — NOTE: mjtpu's
    contact ordering can differ from C's when several collider groups
    coexist), mindist, maxforce (largest normal force), netforce
    (world-frame force/torque sums about the force-magnitude-weighted
    centroid, reported in the pos field).
  - C applies no cutoff clamp to this sensor (oracle-probed)."""
  from mjtpu._src import collision_driver

  con = d.contact
  nslots = con.dist.shape[0] if collision_driver.ncon(m) else 0
  if nslots == 0:
    return sd
  dtype = sd.dtype
  forces6 = support.contact_forces(m, d)
  detected = con.dist < con.margin
  geom_body = jnp.asarray(np.asarray(m.geom_bodyid))
  intprm = np.asarray(m.sensor_intprm)
  objtype_all = np.asarray(m.sensor_objtype)
  objid_all = np.asarray(m.sensor_objid)
  reftype_all = np.asarray(m.sensor_reftype)
  refid_all = np.asarray(m.sensor_refid)
  adr_all = np.asarray(m.sensor_adr)
  dim_all = np.asarray(m.sensor_dim)

  def side_mask(otype, oid):
    if otype == int(ObjType.GEOM):
      return con.geom1 == oid, con.geom2 == oid
    if otype == int(ObjType.BODY):
      b1, b2 = geom_body[con.geom1], geom_body[con.geom2]
      return b1 == oid, b2 == oid
    if otype == int(ObjType.XBODY):  # subtree criterion
      sub = jnp.asarray(_subtree_bodies(m, oid))
      return sub[geom_body[con.geom1]], sub[geom_body[con.geom2]]
    raise NotImplementedError(f"contact sensor criterion objtype {otype}")

  for sidx in ids:
    dataspec, reduce_, num = (int(x) for x in intprm[sidx])
    slotdim = sum(w for bit, _, w in _CONTACT_FIELDS if dataspec & bit)
    assert slotdim * num == int(dim_all[sidx])

    # --- matching + flip orientation ---
    whole = detected
    sided = []
    for otype, oid in (
        (int(objtype_all[sidx]), int(objid_all[sidx])),
        (int(reftype_all[sidx]), int(refid_all[sidx])),
    ):
      if oid < 0 or otype == int(ObjType.UNKNOWN):
        continue
      if otype == int(ObjType.SITE):
        whole = whole & _points_in_site(m, d, oid, con.pos)
      else:
        sided.append(side_mask(otype, oid))
    if not sided:
      match, flip = whole, jnp.zeros(nslots, bool)
    elif len(sided) == 1:
      m1, m2 = sided[0]
      match, flip = whole & (m1 | m2), m2 & ~m1
    else:
      (a1, a2), (b1m, b2m) = sided
      fwd, rev = a1 & b2m, a2 & b1m
      match, flip = whole & (fwd | rev), rev & ~fwd

    found = jnp.sum(match.astype(jnp.int32))
    sgn = jnp.where(flip, -1.0, 1.0).astype(dtype)
    t2flip = jnp.stack([jnp.ones_like(sgn), jnp.ones_like(sgn), sgn], -1)
    fields = {
        "force": forces6[:, :3] * t2flip,
        "torque": forces6[:, 3:] * t2flip,
        "dist": con.dist[:, None],
        "pos": con.pos,
        "normal": con.frame[:, 0] * sgn[:, None],
        "tangent": con.frame[:, 1] * sgn[:, None],
    }

    if reduce_ == _CONTACT_NETFORCE:
      mf = match.astype(dtype)
      # world-frame wrench per contact, oriented (flip negates the wrench)
      f_w = jnp.einsum("ci,cij->cj", forces6[:, :3], con.frame) * sgn[:, None]
      t_w = jnp.einsum("ci,cij->cj", forces6[:, 3:], con.frame) * sgn[:, None]
      # force-magnitude weights for the centroid (oracle-probed: |f|, not fn)
      w = mf * jnp.linalg.norm(forces6[:, :3], axis=1)
      pos_c = (w[:, None] * con.pos).sum(0) / jnp.maximum(w.sum(), 1e-15)
      f_net = (mf[:, None] * f_w).sum(0)
      t_net = (
          mf[:, None] * (jnp.cross(con.pos - pos_c, f_w) + t_w)
      ).sum(0)
      any_found = (found > 0).astype(dtype)
      slot = {
          "force": f_net * any_found,
          "torque": t_net * any_found,
          "pos": pos_c * any_found,
          "dist": jnp.zeros(1, dtype),
          "normal": jnp.zeros(3, dtype),
          "tangent": jnp.zeros(3, dtype),
          "found": found.astype(dtype)[None],
      }
      row = jnp.concatenate(
          [slot[name] for bit, name, _ in _CONTACT_FIELDS if dataspec & bit]
      )
      slots = jnp.broadcast_to(row, (num, slotdim))
    elif reduce_ in (_CONTACT_MINDIST, _CONTACT_MAXFORCE):
      if reduce_ == _CONTACT_MINDIST:
        i = jnp.argmin(jnp.where(match, con.dist, jnp.inf))
      else:
        i = jnp.argmax(jnp.where(match, forces6[:, 0], -jnp.inf))
      any_found = (found > 0).astype(dtype)
      slot = {k: v[i] * any_found for k, v in fields.items()}
      slot["found"] = found.astype(dtype)[None]
      row = jnp.concatenate(
          [slot[name] for bit, name, _ in _CONTACT_FIELDS if dataspec & bit]
      )
      slots = jnp.broadcast_to(row, (num, slotdim))
    else:
      # first `num` matches in contact order; extras go to a dump row
      rows = jnp.concatenate(
          [
              fields[name] if name != "found"
              else jnp.zeros((nslots, 1), dtype)
              for bit, name, _ in _CONTACT_FIELDS
              if dataspec & bit
          ],
          axis=1,
      )
      order = jnp.cumsum(match.astype(jnp.int32)) - 1
      tgt = jnp.where(match & (order < num), order, num)
      slots = jnp.zeros((num + 1, slotdim), dtype).at[tgt].set(rows)[:num]
      if dataspec & 1:
        nfill = jnp.minimum(found, num)
        slots = slots.at[:, 0].set(
            jnp.where(jnp.arange(num) < nfill, found.astype(dtype), 0.0)
        )

    adr = int(adr_all[sidx])
    sd = sd.at[adr : adr + num * slotdim].set(slots.reshape(-1))
  return sd
