"""Test utilities: random MJCF generation for fuzz parity testing.

Reference capability map: mujoco_torch/_src/test_util.py:161-356
(create_mjcf: random kinematic trees with joint stacks, geoms, contact
pairs/excludes, actuators — the fuzz oracle for per-stage parity tests).
"""

from __future__ import annotations

import numpy as np

_JOINTS = ["hinge", "slide", "ball"]
_GEOMS = ["sphere", "capsule", "box"]


def create_mjcf(
    seed: int,
    max_bodies: int = 6,
    max_joints_per_body: int = 2,
    floor: bool = True,
    free_root: bool = True,
    actuators: bool = True,
    tendons: bool = False,
    frictionloss: bool = False,
    limits: bool = True,
    timestep: float = 0.002,
    integrator: str = "Euler",
    cone: str = "pyramidal",
    solver: str = "Newton",
    geom_types: tuple = ("sphere", "capsule", "box"),
    contact_pairs: bool = False,
    excludes: bool = False,
    equality: bool = False,
    equality_types: tuple = ("connect",),
    spatial_tendons: bool = False,
) -> str:
  """Generates a random but well-formed MJCF string.

  spatial_tendons: adds a site to every body plus a no-collision wrap
  sphere on a middle body, and a <spatial> tendon threading first site ->
  wrap geom -> last site (exercises the mju_wrap path structurally, not
  just on hand-written models).  equality_types: the constraint classes
  <equality> may draw from — "connect", "weld", "joint" (needs two scalar
  joints), "tendon" (needs two tendons, implies tendons=True upstream).
  """
  rng = np.random.default_rng(seed)
  nbody = int(rng.integers(2, max_bodies + 1))

  lines = [
      f'<mujoco model="fuzz{seed}">',
      f'  <option timestep="{timestep}" integrator="{integrator}"'
      f' cone="{cone}" solver="{solver}"/>',
      "  <worldbody>",
  ]
  if floor:
    lines.append('    <geom name="floor" type="plane" size="10 10 0.1"/>')

  joint_names = []
  depth = 0

  geom_names = []

  def geom_str(i):
    g = geom_types[rng.integers(0, len(geom_types))]
    geom_names.append(f"g{i}")
    nm = f'name="g{i}" '
    if g == "sphere":
      return (f'<geom {nm}type="sphere" size="{rng.uniform(0.04, 0.12):.3f}"'
              f' mass="{rng.uniform(0.2, 1.5):.3f}"/>')
    if g == "capsule":
      return (
          f'<geom {nm}type="capsule" size="{rng.uniform(0.03, 0.08):.3f} '
          f'{rng.uniform(0.08, 0.25):.3f}" mass="{rng.uniform(0.2, 1.5):.3f}"/>'
      )
    return (
        f'<geom {nm}type="box" size="{rng.uniform(0.05, 0.15):.3f} '
        f'{rng.uniform(0.05, 0.15):.3f} {rng.uniform(0.05, 0.15):.3f}"'
        f' mass="{rng.uniform(0.2, 1.5):.3f}"/>'
    )

  for b in range(nbody):
    ind = "    " + "  " * depth
    pos = rng.uniform(-0.3, 0.3, 3)
    pos[2] = abs(pos[2]) + 0.4 if depth == 0 else pos[2]
    lines.append(
        f'{ind}<body name="b{b}" pos="{pos[0]:.3f} {pos[1]:.3f} {pos[2]:.3f}">'
    )
    if b == 0 and free_root and rng.random() < 0.5:
      lines.append(f"{ind}  <freejoint/>")
    else:
      njnt = int(rng.integers(1, max_joints_per_body + 1))
      for j in range(njnt):
        jt = _JOINTS[rng.integers(0, len(_JOINTS))]
        if jt == "ball" and j < njnt - 1:
          jt = "hinge"  # rotations may not follow a ball in a stack (mj rule)
        name = f"j{b}_{j}"
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        attrs = (
            f'name="{name}" type="{jt}" axis="{axis[0]:.3f} {axis[1]:.3f}'
            f' {axis[2]:.3f}" damping="{rng.uniform(0.01, 0.5):.3f}"'
            f' armature="{rng.uniform(0.01, 0.1):.3f}"'
        )  # armature keeps qM strictly PD (reference create_mjcf does the same)
        if jt != "ball" and limits and rng.random() < 0.5:
          lo, hi = sorted(rng.uniform(-1.2, 1.2, 2))
          attrs += f' limited="true" range="{lo:.3f} {hi:.3f}"'
        if jt != "ball" and frictionloss and rng.random() < 0.5:
          attrs += f' frictionloss="{rng.uniform(0.05, 0.3):.3f}"'
        if jt != "ball" and rng.random() < 0.3:
          attrs += f' stiffness="{rng.uniform(0.5, 5.0):.2f}"'
        lines.append(f"{ind}  <joint {attrs}/>")
        if jt != "ball":
          joint_names.append(name)
    lines.append(f"{ind}  {geom_str(b)}")
    if spatial_tendons:
      sp = rng.uniform(-0.08, 0.08, 3)
      lines.append(
          f'{ind}  <site name="site{b}" pos="{sp[0]:.3f} {sp[1]:.3f}'
          f' {sp[2]:.3f}" size="0.005"/>'
      )
      if b == nbody // 2 and nbody >= 3:
        # wrap sphere: collision-disabled, small mass, near the tendon path
        lines.append(
            f'{ind}  <geom name="wrapg" type="sphere"'
            f' size="{rng.uniform(0.05, 0.1):.3f}" pos="0 0 0"'
            f' contype="0" conaffinity="0" mass="0.05"/>'
        )
    if b < nbody - 1 and rng.random() < 0.7:
      depth += 1  # child of this body
    else:
      lines.append(f"{ind}</body>")

  for _ in range(depth):
    depth -= 1
    ind = "    " + "  " * depth
    lines.append(f"{ind}</body>")
  lines.append("  </worldbody>")

  tendon_names = []
  tendon_lines = []
  if tendons and len(joint_names) >= 2:
    tendon_lines.append('    <fixed name="t0">')
    for name in joint_names[:2]:
      tendon_lines.append(
          f'      <joint joint="{name}" coef="{rng.uniform(-1, 1):.3f}"/>')
    tendon_lines.append("    </fixed>")
    tendon_names.append("t0")
    # second fixed tendon only when tendon-equality fuzz asks for it (keeps
    # the rng stream of pre-existing seeds unchanged)
    if "tendon" in equality_types and len(joint_names) >= 4:
      tendon_lines.append('    <fixed name="t1">')
      for name in joint_names[2:4]:
        tendon_lines.append(
            f'      <joint joint="{name}" coef="{rng.uniform(-1, 1):.3f}"/>')
      tendon_lines.append("    </fixed>")
      tendon_names.append("t1")
  if spatial_tendons and nbody >= 2:
    attrs = (f'name="st0" stiffness="{rng.uniform(0.5, 8.0):.2f}"'
             f' damping="{rng.uniform(0.0, 0.5):.3f}"')
    if rng.random() < 0.5:
      lo = rng.uniform(0.05, 0.2)
      attrs += f' limited="true" range="{lo:.3f} {lo + rng.uniform(0.3, 1.0):.3f}"'
    tendon_lines.append(f"    <spatial {attrs}>")
    tendon_lines.append('      <site site="site0"/>')
    if nbody >= 3:
      tendon_lines.append('      <geom geom="wrapg"/>')
    tendon_lines.append(f'      <site site="site{nbody - 1}"/>')
    tendon_lines.append("    </spatial>")
    tendon_names.append("st0")
  if tendon_lines:
    lines.append("  <tendon>")
    lines.extend(tendon_lines)
    lines.append("  </tendon>")

  # contact pairs / excludes between non-adjacent bodies (reference
  # create_mjcf's pair/exclude fuzzing)
  contact_lines = []
  if contact_pairs and len(geom_names) >= 2:
    g1, g2 = rng.choice(geom_names, 2, replace=False)
    condim = int(rng.choice([1, 3, 4, 6]))
    fr = rng.uniform(0.3, 1.5)
    contact_lines.append(
        f'    <pair geom1="{g1}" geom2="{g2}" condim="{condim}"'
        f' friction="{fr:.3f} {fr:.3f} 0.005 0.0001 0.0001"'
        f' margin="{rng.uniform(0, 0.02):.4f}"/>'
    )
  if excludes and nbody >= 3:
    b1, b2 = sorted(rng.choice(nbody, 2, replace=False))
    contact_lines.append(f'    <exclude body1="b{b1}" body2="b{b2}"/>')
  if contact_lines:
    lines.append("  <contact>")
    lines.extend(contact_lines)
    lines.append("  </contact>")

  if equality and nbody >= 3:
    # draw a constraint class whose prerequisites the generated model meets
    candidates = [t for t in equality_types if t in ("connect", "weld")]
    if len(joint_names) >= 2 and "joint" in equality_types:
      candidates.append("joint")
    if len(tendon_names) >= 2 and "tendon" in equality_types:
      candidates.append("tendon")
    if not candidates:
      eq = None
    elif len(candidates) == 1:  # no rng draw: preserves pre-existing streams
      eq = candidates[0]
    else:
      eq = candidates[int(rng.integers(0, len(candidates)))]
    eq_lines = []
    if eq in ("connect", "weld"):
      b1, b2 = sorted(rng.choice(nbody, 2, replace=False))
      anchor = rng.uniform(-0.1, 0.1, 3)
      if eq == "connect":
        eq_lines.append(
            f'    <connect body1="b{b1}" body2="b{b2}"'
            f' anchor="{anchor[0]:.3f} {anchor[1]:.3f} {anchor[2]:.3f}"/>'
        )
      else:
        eq_lines.append(
            f'    <weld body1="b{b1}" body2="b{b2}"'
            f' anchor="{anchor[0]:.3f} {anchor[1]:.3f} {anchor[2]:.3f}"/>'
        )
    elif eq == "joint":
      j1, j2 = rng.choice(joint_names, 2, replace=False)
      poly = rng.uniform(-0.5, 0.5, 5)
      poly[0] = rng.uniform(-0.2, 0.2)
      eq_lines.append(
          f'    <joint joint1="{j1}" joint2="{j2}" polycoef="'
          + " ".join(f"{c:.3f}" for c in poly) + '"/>'
      )
    elif eq == "tendon":
      t1, t2 = tendon_names[0], tendon_names[1]
      poly = rng.uniform(-0.5, 0.5, 5)
      eq_lines.append(
          f'    <tendon tendon1="{t1}" tendon2="{t2}" polycoef="'
          + " ".join(f"{c:.3f}" for c in poly) + '"/>'
      )
    if eq_lines:
      lines.append("  <equality>")
      lines.extend(eq_lines)
      lines.append("  </equality>")

  if actuators and joint_names:
    lines.append("  <actuator>")
    for name in joint_names[: min(4, len(joint_names))]:
      if rng.random() < 0.5:
        lines.append(
            f'    <motor joint="{name}" gear="{rng.uniform(5, 50):.1f}"'
            f' ctrlrange="-1 1" ctrllimited="true"/>'
        )
      else:
        lines.append(
            f'    <position joint="{name}" kp="{rng.uniform(1, 20):.1f}"'
            f' ctrlrange="-1 1" ctrllimited="true"/>'
        )
    lines.append("  </actuator>")
  lines.append("</mujoco>")
  return "\n".join(lines)
