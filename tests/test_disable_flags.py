"""Disable-flag parity vs MuJoCo C (reference constraint_test.py /
forward_test.py disable-flag oracles): each flag toggled on a model that
exercises it, 50-step trajectory must still track mj_step at f64."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mjtpu
from tests.conftest import load_mj

# (model, flag) pairs chosen so the flag actually changes the dynamics
CASES = [
    ("spheres.xml", "contact"),
    ("spheres.xml", "constraint"),
    ("spheres.xml", "gravity"),
    ("spheres.xml", "warmstart"),
    ("equality.xml", "equality"),
    ("friction_tendon.xml", "frictionloss"),
    ("friction_tendon.xml", "limit"),
    # mujoco >= 3.10 split PASSIVE into SPRING + DAMPER
    ("friction_tendon.xml", "spring"),
    ("friction_tendon.xml", "damper"),
    ("cartpole.xml", "actuation"),
    ("cartpole.xml", "clampctrl"),
    ("pendulum.xml", "eulerdamp"),
    ("pendulum.xml", "refsafe"),
    ("capsules.xml", "filterparent"),
]


@pytest.mark.parametrize("model_name,flag", CASES)
def test_disable_flag_parity(model_name, flag):
  mjm = load_mj(model_name)
  bit = getattr(mujoco.mjtDisableBit, f"mjDSBL_{flag.upper()}", None)
  if bit is None:
    pytest.skip(f"mjDSBL_{flag.upper()} not in mujoco {mujoco.__version__}")
  mjm.opt.disableflags |= bit
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(1)
  mjd.qpos[:] = mjm.qpos0 + rng.uniform(-0.05, 0.05, mjm.nq)
  mjd.qvel[:] = rng.uniform(-0.05, 0.05, mjm.nv)
  if mjm.nu:
    mjd.ctrl[:] = rng.uniform(-1, 1, mjm.nu)

  m = mjtpu.put_model(mjm)
  d = mjtpu.make_data(m)
  d = d.replace(
      qpos=jnp.asarray(np.array(mjd.qpos)),
      qvel=jnp.asarray(np.array(mjd.qvel)),
      ctrl=jnp.asarray(np.array(mjd.ctrl)),
  )
  # jit (the production path): eager stepping here compiled thousands of
  # per-primitive CPU executables across the 14 cases and eventually
  # segfaulted XLA's in-process compiler
  step = jax.jit(mjtpu.step)
  for i in range(50):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
    err = max(
        np.abs(np.asarray(d.qpos) - mjd.qpos).max(),
        np.abs(np.asarray(d.qvel) - mjd.qvel).max(),
    )
    assert err < 1e-8, f"{model_name} disable={flag} diverged at {i}: {err:.2e}"
