"""Renderer tests: shapes, shading modes, textures, skybox, batching.

Reference capability map: mujoco_torch/_src/render.py (flat/phong shading,
shadows, fog, SSAA, texture sampling, render_batch).  No pixel oracle
exists, so these validate structure and physical plausibility: textured
surfaces show spatial variation, sky pixels come from the skybox, and
batched rendering matches per-env rendering.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu

_XML = """
<mujoco>
<asset>
  <texture name="sky" type="skybox" builtin="gradient" rgb1=".3 .5 .8"
           rgb2=".9 .9 .95" width="32" height="32"/>
  <texture name="grid" type="2d" builtin="checker" rgb1=".1 .2 .3"
           rgb2=".8 .8 .8" width="64" height="64"/>
  <material name="grid" texture="grid" texrepeat="8 8"/>
  <material name="red" rgba="1 0 0 1"/>
</asset>
<worldbody>
  <camera name="c" pos="2 -2 1.5" xyaxes="0.7 0.7 0 -0.23 0.23 0.94"/>
  <geom type="plane" size="3 3 .1" material="grid"/>
  <body pos="0 0 0.5"><freejoint/>
    <geom type="box" size=".2 .2 .2" material="grid"/></body>
  <body pos="0.8 0 0.3"><freejoint/>
    <geom type="sphere" size=".25" material="red"/></body>
</worldbody>
</mujoco>
"""


@pytest.fixture(scope="module")
def scene():
  mjm = mujoco.MjModel.from_xml_string(_XML)
  m = mjtpu.put_model(mjm)
  d = mjtpu.forward(m, mjtpu.make_data(m))
  rd = mjtpu.precompute_render_data(m)
  return m, d, rd


def test_render_shapes_and_range(scene):
  m, d, rd = scene
  for kwargs in (
      dict(shading="flat"),
      dict(shading="phong", shadows=True),
      dict(fog=0.2),
      dict(ssaa=2),
  ):
    img = np.asarray(mjtpu.render(m, d, width=32, height=24, rd=rd, **kwargs))
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_texture_sampling(scene):
  m, d, rd = scene
  # plane and box resolved to 2d textures; sphere has plain material rgba
  assert len(rd.textures) == 2
  assert rd.sky_tex is not None
  img = np.asarray(mjtpu.render(m, d, width=96, height=72, rd=rd))
  # checker plane: strong spatial color variation in the lower rows
  assert img[60].std(axis=0).max() > 0.05
  # red sphere visible
  assert ((img[..., 0] > 0.3) & (img[..., 1] < 0.25)).mean() > 0.004


def test_cube_texture():
  """Cube-textured sphere: the cube map is picked up and sampling varies
  across the surface (checker cube -> multi-colored sphere)."""
  xml = """<mujoco>
  <asset>
    <texture name="cb" type="cube" builtin="checker" rgb1="1 0 0"
             rgb2="0 0 1" width="32" height="32"/>
    <material name="cb" texture="cb"/>
  </asset>
  <worldbody>
    <camera name="c" pos="0 -1.5 0.5" xyaxes="1 0 0 0 0.32 0.95"/>
    <body pos="0 0 0.5"><freejoint/>
      <geom type="sphere" size="0.4" material="cb"/></body>
  </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  d = mjtpu.forward(m, mjtpu.make_data(m))
  rd = mjtpu.precompute_render_data(m)
  assert len(rd.textures) == 1 and next(iter(rd.textures.values()))[3] == "cube"
  img = np.asarray(mjtpu.render(m, d, width=64, height=48, rd=rd, camera=0))
  assert np.isfinite(img).all()
  # both checker colors appear on the sphere
  red = ((img[..., 0] > 0.25) & (img[..., 2] < 0.2)).mean()
  blue = ((img[..., 2] > 0.25) & (img[..., 0] < 0.2)).mean()
  assert red > 0.005 and blue > 0.005, (red, blue)


def test_skybox(scene):
  m, d, rd = scene
  img = np.asarray(mjtpu.render(m, d, width=32, height=24, rd=rd))
  flat = np.asarray(
      mjtpu.render(m, d, width=32, height=24,
                   rd=mjtpu.precompute_render_data(m)))
  # top row is sky; with the gradient skybox it should not equal the
  # hard-coded fallback blue exactly
  assert np.isfinite(img[0]).all()
  del flat


_LIT_XML = """
<mujoco>
<worldbody>
  <camera name="c" pos="0 -2.5 2.2" xyaxes="1 0 0 0 0.66 0.75"/>
  <light name="top" pos="0 0 3" dir="0 0 -1" diffuse=".9 .9 .9"
         ambient=".08 .08 .08" specular=".2 .2 .2" cutoff="60"
         castshadow="true"/>
  <geom type="plane" size="4 4 .1" rgba=".7 .7 .7 1"/>
  <body name="blocker" pos="0 0 1.2">
    <geom type="box" size=".35 .35 .06" rgba=".4 .5 .6 1"/>
  </body>
</worldbody>
</mujoco>
"""


def _lit_scene(xml=_LIT_XML):
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  d = mjtpu.forward(m, mjtpu.make_data(m))
  return mjm, m, d, mjtpu.precompute_render_data(m)


def test_scene_light_shadow():
  """A slab under a spot casts a shadow: floor pixels beneath it are
  darker than open floor (reference render.py:486-600 per-light shadow
  rays; shadowed points keep only ambient)."""
  mjm, m, d, rd = _lit_scene()
  img = np.asarray(mjtpu.render(m, d, width=64, height=48, rd=rd,
                                shadows=True))
  img_ns = np.asarray(mjtpu.render(m, d, width=64, height=48, rd=rd,
                                   shadows=False))
  assert np.isfinite(img).all() and img.min() >= 0 and img.max() <= 1
  # shadows only darken; somewhere substantially (the umbra)
  diff = img_ns.mean(-1) - img.mean(-1)
  assert diff.min() > -1e-6
  assert diff.max() > 0.2, diff.max()
  # the slab's own top surface stays lit
  assert img.mean() > 0.05


def test_scene_light_moves_image():
  """Moving the model light moves the lighting: images differ when the
  light position changes (d.light_xpos is actually consumed)."""
  mjm, m, d, rd = _lit_scene()
  img0 = np.asarray(mjtpu.render(m, d, width=48, height=36, rd=rd))
  m2 = m.replace(light_pos=jnp.asarray([[2.5, 0.0, 1.0]], m.light_pos.dtype))
  d2 = mjtpu.forward(m2, mjtpu.make_data(m2))
  img1 = np.asarray(mjtpu.render(m2, d2, width=48, height=36, rd=rd))
  assert np.abs(img0 - img1).max() > 0.05


def test_spot_cutoff():
  """A narrow spot lights fewer floor pixels than a wide one."""
  xml_n = _LIT_XML.replace('cutoff="60"', 'cutoff="12"')
  _, m_w, d_w, rd = _lit_scene()
  _, m_n, d_n, _ = _lit_scene(xml_n)
  bright = lambda m_, d_: (
      np.asarray(mjtpu.render(m_, d_, width=48, height=36, rd=rd)).mean(-1)
      > 0.25
  ).mean()
  assert bright(m_n, d_n) < bright(m_w, d_w) - 0.05


def test_point_light_attenuation():
  """With quadratic attenuation, floor far from the light is dimmer."""
  xml = _LIT_XML.replace('cutoff="60"', 'cutoff="179"').replace(
      'castshadow="true"', 'castshadow="false" attenuation="1 0 0.35"')
  _, m, d, rd = _lit_scene(xml)
  img = np.asarray(mjtpu.render(m, d, width=64, height=48, rd=rd)).mean(-1)
  # bottom rows of the image are floor near the camera (far from the
  # light's ground point) vs center rows right under the light
  center = img[20:28, 24:40].mean()
  edge_cols = np.concatenate([img[40:, :8].ravel(), img[40:, -8:].ravel()])
  assert center > edge_cols.mean() + 0.05


def test_inactive_light_dark():
  """light_active=False removes the light's contribution entirely."""
  mjm, m, d, rd = _lit_scene()
  img_on = np.asarray(mjtpu.render(m, d, width=32, height=24, rd=rd))
  m_off = m.replace(light_active=np.zeros(1, bool))
  img_off = np.asarray(mjtpu.render(m_off, d, width=32, height=24, rd=rd))
  assert img_on.mean() > img_off.mean() + 0.1
  # non-sky pixels are black without any light
  floor = img_off[-6:]
  assert floor.max() < 1e-6


def test_scene_lights_opt_out():
  """scene_lights=False falls back to the fixed directional light."""
  mjm, m, d, rd = _lit_scene()
  img = np.asarray(mjtpu.render(m, d, width=32, height=24, rd=rd,
                                scene_lights=False))
  assert np.isfinite(img).all() and img.mean() > 0.1


def test_cube_skybox_faces():
  """Skybox cube layout (H == 6W, face order right/left/up/down/front/back)
  is sampled per-face: looking along each axis returns that face's color
  (reference render.py skybox sampling; MuJoCo stores builtin skyboxes as
  a 6-face vertical stack)."""
  # cameras look along +x/-x/+y/-y/+z/-z (view dir = -z of camera frame)
  xml = """<mujoco>
  <asset><texture name="sky" type="skybox" builtin="flat" rgb1="1 1 1"
                  width="8" height="48"/></asset>
  <worldbody>
    <camera name="xp" xyaxes="0 -1 0 0 0 1"/>
    <camera name="xn" xyaxes="0 1 0 0 0 1"/>
    <camera name="yp" xyaxes="1 0 0 0 0 1"/>
    <camera name="yn" xyaxes="-1 0 0 0 0 1"/>
    <camera name="zp" xyaxes="1 0 0 0 -1 0"/>
    <camera name="zn" xyaxes="1 0 0 0 1 0"/>
    <geom type="sphere" size=".01" pos="100 100 100"/>
  </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  tid = int(np.flatnonzero(np.atleast_1d(mjm.tex_type) == 2)[0])
  w, h = int(mjm.tex_width[tid]), int(mjm.tex_height[tid])
  assert h == 6 * w
  face_colors = np.array(
      [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1], [0, 1, 1]],
      np.float64)
  img = np.zeros((h, w, 3))
  for f in range(6):
    img[f * w : (f + 1) * w] = face_colors[f]
  adr = int(mjm.tex_adr[tid])
  mjm.tex_data[adr : adr + h * w * 3] = np.round(
      img.reshape(-1) * 255).astype(np.uint8)
  m = mjtpu.put_model(mjm)
  d = mjtpu.forward(m, mjtpu.make_data(m))
  rd = mjtpu.precompute_render_data(m)
  # camera order above maps +x,-x,+y,-y,+z,-z onto MuJoCo face indices
  # right(0), left(1), front(4), back(5), up(2), down(3)
  expected = face_colors[[0, 1, 4, 5, 2, 3]]
  for cam in range(6):
    out = np.asarray(mjtpu.render(m, d, width=5, height=5, camera=cam, rd=rd))
    np.testing.assert_allclose(out[2, 2], expected[cam], atol=2 / 255,
                               err_msg=f"camera {cam}")


def test_single_square_skybox_repeats():
  """A one-square skybox image (H == W, e.g. loaded from a single PNG)
  repeats the same image on all faces.  MuJoCo expands builtins to the
  6-face stack, so the square layout is injected via RenderData."""
  import dataclasses

  xml = """<mujoco>
  <worldbody>
    <camera name="xp" xyaxes="0 -1 0 0 0 1"/>
    <camera name="zn" xyaxes="1 0 0 0 1 0"/>
    <geom type="sphere" size=".01" pos="100 100 100"/>
  </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  d = mjtpu.forward(m, mjtpu.make_data(m))
  rd = mjtpu.precompute_render_data(m)
  sky = np.full((8, 8, 3), [0.2, 0.9, 0.4])
  rd = dataclasses.replace(rd, sky_tex=sky)
  for cam in range(2):
    out = np.asarray(mjtpu.render(m, d, width=5, height=5, camera=cam, rd=rd))
    np.testing.assert_allclose(out[2, 2], [0.2, 0.9, 0.4], atol=2 / 255)


def test_spot_cutoff_boundary_radius():
  """The spot's lit disc on the floor ends at r = h·tan(cutoff): the
  cutoff test in _shade_scene_lights is a hard angular boundary, so the
  measured lit radius tracks the cutoff angle quantitatively."""
  xml = """<mujoco>
  <worldbody>
    <camera name="c" pos="0 0 6" xyaxes="1 0 0 0 1 0" fovy="90"/>
    <light name="s" pos="0 0 3" dir="0 0 -1" diffuse="1 1 1"
           ambient="0 0 0" specular="0 0 0" cutoff="{cut}"
           castshadow="false" attenuation="1 0 0"/>
    <geom type="plane" size="8 8 .1" rgba="1 1 1 1"/>
  </worldbody>
  </mujoco>"""
  for cut in (20.0, 40.0):
    mjm = mujoco.MjModel.from_xml_string(xml.format(cut=cut))
    m = mjtpu.put_model(mjm)
    d = mjtpu.forward(m, mjtpu.make_data(m))
    rd = mjtpu.precompute_render_data(m)
    n = 96
    img = np.asarray(mjtpu.render(m, d, width=n, height=n, rd=rd)).mean(-1)
    # overhead fovy=90 camera at z=6: half-width at the floor is 6 m
    xs = np.linspace(-6, 6, n)
    lit_cols = np.abs(xs)[img[n // 2] > 1e-3]
    assert lit_cols.size, f"cutoff {cut}: nothing lit"
    r_measured = lit_cols.max()
    r_expected = 3.0 * np.tan(np.radians(cut))
    assert abs(r_measured - r_expected) < 0.25, (cut, r_measured, r_expected)


def test_render_batch(scene):
  m, d, rd = scene
  batch = jax.tree.map(lambda x: jnp.stack([x, x]), d)
  imgs = np.asarray(
      mjtpu.render_batch(m, batch, width=16, height=12, rd=rd))
  assert imgs.shape == (2, 12, 16, 3)
  one = np.asarray(mjtpu.render(m, d, width=16, height=12, rd=rd))
  np.testing.assert_allclose(imgs[0], one, rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(imgs[0], imgs[1])


def test_depth_and_segmentation(scene):
  """render_rgbd returns the reference's (rgb, depth, seg) triple
  (reference render.py:759-763): depth is the positive ray distance on
  hits and -1 on misses; seg is the geom id on hits and -1 on misses."""
  m, d, rd = scene
  rgb, depth, seg = [
      np.asarray(x)
      for x in mjtpu.render_rgbd(m, d, width=64, height=48, rd=rd)
  ]
  assert rgb.shape == (48, 64, 3)
  assert depth.shape == (48, 64) and seg.shape == (48, 64)
  hit = seg >= 0
  assert hit.any() and (~hit).any()
  assert (depth[hit] > 0).all()
  np.testing.assert_array_equal(depth[~hit], -1.0)
  # seg values are real geom ids: plane(0), box(1), sphere(2)
  assert set(np.unique(seg)) <= {-1, 0, 1, 2}
  assert {0, 2} <= set(np.unique(seg))  # floor and red sphere visible
  # depth is metric: the camera is at |(2,-2,1.5)| ~ 3.2 from the origin
  assert 1.0 < depth[hit].min() < 4.0


def test_depth_matches_geometry():
  """A unit-area box face 2m straight ahead reads depth ~= 2."""
  xml = """<mujoco><worldbody>
    <camera name="c" pos="0 -2 0.5" xyaxes="1 0 0 0 0 1"/>
    <body pos="0 0.5 0.5"><geom type="box" size="1 0.5 1"/></body>
  </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  d = mjtpu.forward(m, mjtpu.make_data(m))
  _, depth, seg = mjtpu.render_rgbd(m, d, width=9, height=9)
  c = np.asarray(depth)[4, 4]
  assert np.asarray(seg)[4, 4] == 0
  np.testing.assert_allclose(c, 2.0, atol=0.02)


def test_fog_fades_with_distance(scene):
  """Linear fog blends far hits toward the fog color but leaves misses
  (sky) untouched (reference render.py:695-710)."""
  m, d, rd = scene
  rgb0, depth, seg = mjtpu.render_rgbd(m, d, width=48, height=36, rd=rd)
  rgb1 = mjtpu.render(m, d, width=48, height=36, rd=rd, fog=0.5)
  rgb0, rgb1 = np.asarray(rgb0), np.asarray(rgb1)
  hit = np.asarray(seg) >= 0
  fog_col = np.array([0.8, 0.85, 0.9])
  d0 = np.abs(rgb0 - fog_col).sum(-1)
  d1 = np.abs(rgb1 - fog_col).sum(-1)
  # hits move toward the fog color; the farthest hits move the most
  assert d1[hit].mean() < d0[hit].mean() - 0.05
  far = hit & (np.asarray(depth) > np.asarray(depth)[hit].mean())
  assert d1[far].max() < 0.75
  # sky pixels are unchanged
  np.testing.assert_allclose(rgb1[~hit], rgb0[~hit], atol=1e-6)


def test_ssaa_antialiases(scene):
  """SSAA=4 produces intermediate edge values: strictly more unique
  pixel intensities than the aliased render, same overall image."""
  m, d, rd = scene
  img1 = np.asarray(mjtpu.render(m, d, width=32, height=24, rd=rd, ssaa=1))
  img4 = np.asarray(mjtpu.render(m, d, width=32, height=24, rd=rd, ssaa=4))
  assert img4.shape == img1.shape
  assert np.abs(img4 - img1).mean() < 0.1  # same scene
  assert len(np.unique(img4.round(4))) > len(np.unique(img1.round(4)))
  # ssaa depth averages samples; seg takes the center sample (still ids)
  _, depth4, seg4 = mjtpu.render_rgbd(
      m, d, width=32, height=24, rd=rd, ssaa=4)
  assert depth4.shape == (24, 32) and seg4.shape == (24, 32)
  assert set(np.unique(np.asarray(seg4))) <= {-1, 0, 1, 2}


def test_cylinder_and_ellipsoid_rendering():
  """Cylinder and ellipsoid hit/normal paths (reference
  render_test.py:242-262 covers cylinders; mjtpu renders ellipsoids
  too)."""
  xml = """<mujoco><worldbody>
    <camera name="c" pos="0 -3 1" xyaxes="1 0 0 0 0.32 0.95"/>
    <geom type="plane" size="4 4 .1" rgba=".6 .6 .6 1"/>
    <body pos="-0.7 0 0.6"><geom type="cylinder" size="0.3 0.5"
      rgba="1 0 0 1"/></body>
    <body pos="0.7 0 0.6"><geom type="ellipsoid" size="0.3 0.2 0.5"
      rgba="0 0 1 1"/></body>
  </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  d = mjtpu.forward(m, mjtpu.make_data(m))
  rgb, _, seg = mjtpu.render_rgbd(m, d, width=64, height=48)
  rgb, seg = np.asarray(rgb), np.asarray(seg)
  assert np.isfinite(rgb).all()
  assert (seg == 1).mean() > 0.01, "cylinder visible"
  assert (seg == 2).mean() > 0.01, "ellipsoid visible"
  red = rgb[seg == 1]
  blue = rgb[seg == 2]
  assert red[:, 0].mean() > red[:, 2].mean() + 0.1
  assert blue[:, 2].mean() > blue[:, 0].mean() + 0.1


def test_camera_pose_follows_body():
  """A body-mounted camera moves with qpos: forward() updates cam_xpos
  and the rendered segmentation shifts (reference render_test.py:228)."""
  xml = """<mujoco><worldbody>
    <geom type="plane" size="4 4 .1"/>
    <body pos="0 0 1"><joint type="slide" axis="1 0 0"/>
      <geom type="sphere" size="0.01" rgba="0 0 0 0" contype="0"
        conaffinity="0" mass="1"/>
      <camera name="c" pos="0 0 0.3" xyaxes="1 0 0 0 0.32 0.95"/></body>
    <body pos="0 2 0.4"><geom type="box" size=".4 .4 .4" rgba="1 0 0 1"/>
    </body>
  </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  d0 = mjtpu.forward(m, mjtpu.make_data(m))
  d1 = mjtpu.forward(m, mjtpu.make_data(m).replace(
      qpos=jnp.asarray([1.5], m.qpos0.dtype)))
  assert abs(float(d1.cam_xpos[0, 0]) - float(d0.cam_xpos[0, 0]) - 1.5) < 1e-9
  seg0 = np.asarray(mjtpu.render_rgbd(m, d0, width=48, height=36)[2])
  seg1 = np.asarray(mjtpu.render_rgbd(m, d1, width=48, height=36)[2])
  assert (seg0 != seg1).mean() > 0.01


def test_background_color(scene):
  """background= overrides skybox/default sky on miss pixels (reference
  render_test.py:336)."""
  m, d, rd = scene
  rgb, _, seg = mjtpu.render_rgbd(m, d, width=32, height=24, rd=rd,
                                  background=(0.0, 1.0, 0.0))
  rgb, seg = np.asarray(rgb), np.asarray(seg)
  miss = seg < 0
  assert miss.any()
  assert np.abs(rgb[miss] - np.array([0.0, 1.0, 0.0])).max() < 1e-6


def test_render_batch_rgbd(scene):
  m, d, rd = scene
  batch = jax.tree.map(lambda x: jnp.stack([x, x]), d)
  rgb, depth, seg = mjtpu.render_batch_rgbd(
      m, batch, width=16, height=12, rd=rd)
  assert rgb.shape == (2, 12, 16, 3)
  assert depth.shape == (2, 12, 16)
  assert seg.shape == (2, 12, 16)
  one = mjtpu.render_rgbd(m, d, width=16, height=12, rd=rd)
  np.testing.assert_allclose(np.asarray(rgb[0]), np.asarray(one[0]),
                             rtol=1e-5, atol=1e-6)
  np.testing.assert_array_equal(np.asarray(seg[0]), np.asarray(one[2]))
