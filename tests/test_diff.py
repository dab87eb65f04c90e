"""Differentiable-simulation gradients: autodiff vs finite differences
(reference tests/test_diff_gradients.py)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mjtpu
from tests.conftest import load_mj


def _loss_fn(m, nsteps=20):
  d0 = mjtpu.make_data(m)

  def loss(qvel0):
    d = d0.replace(qvel=qvel0)
    for _ in range(nsteps):
      d = mjtpu.step(m, d)
    return jnp.sum(d.qpos ** 2)

  return loss


def test_smooth_gradients():
  """No contacts: grad through the full pipeline matches finite differences."""
  mjm = load_mj("pendulum.xml")
  m = mjtpu.put_model(mjm)
  with mjtpu.differentiable_mode():
    loss = _loss_fn(m)
    g = jax.grad(loss)(jnp.zeros(mjm.nv))
    # central finite differences
    eps = 1e-6
    for i in range(mjm.nv):
      e = jnp.zeros(mjm.nv).at[i].set(eps)
      fd = (loss(e) - loss(-e)) / (2 * eps)
      np.testing.assert_allclose(np.asarray(g[i]), np.asarray(fd), rtol=1e-4)


def test_contact_gradients_finite():
  """With contacts + CFD: gradients exist and are finite."""
  mjm = load_mj("spheres.xml")
  m = mjtpu.put_model(mjm)
  with mjtpu.differentiable_mode(cfd=True, cfd_width=0.01):
    loss = _loss_fn(m, nsteps=10)
    g = jax.grad(loss)(jnp.zeros(mjm.nv))
  assert np.isfinite(np.asarray(g)).all()
  assert np.abs(np.asarray(g)).max() > 0


def test_smooth_collisions_convex_blend():
  """smooth_collisions: convex-case switches blend (grad flows, no jumps).

  A sphere near a box corner sits where the sphere_convex inside/outside
  and face-selection switches live; with smooth_collisions the contact
  dist must be differentiable wrt qpos and match finite differences of
  the (smoothed) function (reference diff_config smooth case blending).
  """
  xml = """
  <mujoco><worldbody>
    <body pos="0 0 0"><geom type="box" size=".2 .2 .2" mass="1"/></body>
    <body pos="0.21 0.21 0.1"><freejoint/>
      <geom type="sphere" size=".05" mass="0.1"/></body>
  </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  d0 = mjtpu.make_data(m)

  def mindist(dx):
    d = d0.replace(qpos=d0.qpos.at[0].add(dx))
    d = mjtpu.fwd_position(m, d)
    return jnp.min(d.contact.dist)

  with mjtpu.differentiable_mode(smooth_collisions=True, cfd=True):
    g = jax.grad(mindist)(jnp.zeros(()))
    eps = 1e-6
    fd = (mindist(jnp.asarray(eps)) - mindist(jnp.asarray(-eps))) / (2 * eps)
  assert np.isfinite(np.asarray(g)), g
  np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=1e-4,
                             atol=1e-8)

  # hard mode still produces the plain switch (value sanity)
  v_hard = mindist(jnp.zeros(()))
  assert np.isfinite(np.asarray(v_hard))


def test_smooth_collisions_boxbox_blend():
  """convex_convex smooth blending: grad finite and matches FD away from
  face ties (residual kinks at exact SAT argmax ties are documented)."""
  xml = """
  <mujoco><worldbody>
    <body pos="0 0 0"><geom type="box" size=".2 .2 .1" mass="1"/></body>
    <body pos="0.03 0.01 0.205"><freejoint/>
      <geom type="box" size=".1 .1 .1" mass="0.1"/></body>
  </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  d0 = mjtpu.make_data(m)

  def mindist(dz):
    d = d0.replace(qpos=d0.qpos.at[2].add(dz))
    d = mjtpu.fwd_position(m, d)
    return jnp.min(d.contact.dist)

  with mjtpu.differentiable_mode(smooth_collisions=True, cfd=True):
    g = jax.grad(mindist)(jnp.zeros(()))
    eps = 1e-6
    fd = (mindist(jnp.asarray(eps)) - mindist(jnp.asarray(-eps))) / (2 * eps)
  assert np.isfinite(np.asarray(g)), g
  np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=1e-3,
                             atol=1e-8)


def test_cylinder_contact_gradients_finite():
  """Gradients flow through the new plane_cylinder / sphere_cylinder
  colliders (CFD mode): finite and nonzero."""
  mjm = load_mj("sph_cyl.xml")
  m = mjtpu.put_model(mjm)
  with mjtpu.differentiable_mode(cfd=True, cfd_width=0.01):
    loss = _loss_fn(m, nsteps=8)
    g = jax.grad(loss)(jnp.zeros(mjm.nv))
  assert np.isfinite(np.asarray(g)).all()
  assert np.abs(np.asarray(g)).max() > 0


def test_roll_smooth_collisions_gradients():
  """smooth_collisions blending through plane_cylinder's sign/degenerate
  case selects: grad of contact dist wrt qpos is finite."""
  mjm = load_mj("roll.xml")
  m = mjtpu.put_model(mjm)

  def deepest(dq):
    d = mjtpu.make_data(m)
    d = d.replace(qpos=d.qpos + dq)
    d = mjtpu.fwd_position(m, d)
    return jnp.min(d.contact.dist)

  with mjtpu.differentiable_mode(smooth_collisions=True):
    g = jax.grad(deepest)(jnp.zeros(m.nq))
  assert np.isfinite(np.asarray(g)).all()


def test_long_rollout_bounce_gradients_finite():
  """Regression: gradients through a LONG rollout that crosses a contact
  event must stay finite.  The linesearch's phi'' guard used to be the
  reference's additive `d1 + (d1==0)*MINVAL` (solver.py:421 upstream),
  whose backward multiplies cotangents by ~1/d1 on converged lanes and
  underflows `d1**2` for noise-scale search directions — compounding over
  a 60-step scan into inf*0 = NaN (every pre-fix config NaN'd here)."""
  xml = """
  <mujoco>
    <option timestep="0.01"/>
    <worldbody>
      <geom type="plane" size="10 10 .1"/>
      <body pos="0 0 1.0"><freejoint/>
        <geom type="sphere" size="0.1" mass="0.2"/></body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjtpu.put_model(mjm)
  d0 = mjtpu.make_data(m)

  def run(cfgkw):
    with mjtpu.differentiable_mode(**cfgkw):
      def loss(v0):
        d = d0.replace(qvel=d0.qvel.at[:3].set(v0))
        d, _ = jax.lax.scan(
            lambda dd, _: (mjtpu.step(m, dd), None), d, None, length=60)
        return jnp.sum(d.qpos[:2] ** 2)
      return np.asarray(
          jax.jit(jax.grad(loss))(jnp.array([0.3, 0.3, -0.3])))

  g_plain = run({})
  assert np.isfinite(g_plain).all(), g_plain
  assert np.abs(g_plain[:2]).max() > 1e-3  # bounce actually moves the loss
  g_smooth = run(dict(smooth_collisions=True, cfd=True, cfd_width=0.02))
  assert np.isfinite(g_smooth).all(), g_smooth
  # the smoothed gradient approximates the hard one (same sign, same order)
  np.testing.assert_allclose(g_smooth[:2], g_plain[:2], rtol=0.25)
