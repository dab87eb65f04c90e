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
