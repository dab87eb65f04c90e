"""RL environment zoo: functional JAX envs over the mjtpu engine.

Reference capability map: mujoco_torch/zoo/base.py (MujocoTorchEnv +
registry).  The TPU-native design is brax-style functional instead of
TorchRL's stateful EnvBase: explicit PRNG keys replace torch.manual_seed,
auto-reset is a jnp.where mask over the state pytree (the reference's
``dx[done] = ...`` in-place fancy-indexing is untraceable — SURVEY.md §7
step 12), and batching is plain jax.vmap over State.

Usage:
    env = mjtpu.zoo.ENVS["humanoid"]()
    state = jax.vmap(env.reset)(jax.random.split(key, 4096))
    step = jax.jit(jax.vmap(env.step, in_axes=(0, 0)))
    state = step(state, actions)   # auto-resets done envs
"""

from __future__ import annotations

import pathlib
from typing import Callable

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mjtpu
from mjtpu._src.dataclasses import mjstruct
from mjtpu._src.types import Data, Model

ASSETS = pathlib.Path(__file__).parent / "assets"

ENVS: dict[str, Callable[..., "MjtpuEnv"]] = {}


def register_env(name: str):
  def deco(cls):
    ENVS[name] = cls
    cls.name = name
    return cls

  return deco


@mjstruct
class State:
  """Environment state pytree carried between steps."""

  data: Data
  obs: jax.Array
  reward: jax.Array
  done: jax.Array
  key: jax.Array          # per-env PRNG key (for auto-reset noise)
  steps: jax.Array        # episode step counter
  pixels: jax.Array       # (H, W, 3) when pixel_obs is enabled, else (0,)


class MjtpuEnv:
  """Base class: loads the MJCF, owns the Model, defines reset/step.

  Subclasses set ``xml_name``, ``frame_skip``, and implement ``_obs``,
  ``_reward_done``.  reset/step are pure functions safe under jit/vmap.
  """

  xml_name: str = ""
  frame_skip: int = 5
  reset_noise: float = 0.01
  episode_length: int = 1000

  def __init__(self, dtype=None, pixel_obs: bool = False, pixel_size=(64, 64)):
    xml = (ASSETS / self.xml_name).read_text()
    if pixel_obs and "<camera" not in xml:
      # inject a fixed observer camera (reference zoo/base.py:236-260
      # patches the XML the same way)
      xml = xml.replace(
          "<worldbody>",
          '<worldbody><camera name="track" pos="2.5 -2.5 1.5"'
          ' xyaxes="0.7 0.7 0 -0.23 0.23 0.94"/>',
          1,
      )
    self.mj_model = mujoco.MjModel.from_xml_string(xml)
    self._patch_mj_model(self.mj_model)
    self.model: Model = mjtpu.put_model(self.mj_model, dtype=dtype)
    self._d0: Data = mjtpu.make_data(self.model)
    self.pixel_obs = pixel_obs
    self.pixel_size = pixel_size
    self._render_data = (
        mjtpu.precompute_render_data(self.model) if pixel_obs else None
    )

  def _patch_mj_model(self, mjm) -> None:
    """Hook: mutate the host MjModel before put_model (e.g. fill hfield
    elevation data for terrain envs)."""

  @property
  def action_size(self) -> int:
    return self.model.nu

  def _prepare_ctrl(self, action: jax.Array) -> jax.Array:
    """Hook: map the policy action onto the full ctrl vector (identity by
    default; satellite envs append constant rotor-speed targets, matching
    the reference's _prepare_ctrl, zoo/satellite.py:98-105)."""
    return action

  @property
  def observation_size(self) -> int:
    return int(np.prod(jax.eval_shape(self._obs, self._d0).shape))

  # -- episode logic ---------------------------------------------------------

  def _noisy_init(self, key) -> Data:
    kq, kv = jax.random.split(key)
    qpos = self.model.qpos0 + jax.random.uniform(
        kq, (self.model.nq,), minval=-self.reset_noise, maxval=self.reset_noise
    )
    qvel = self.reset_noise * jax.random.normal(kv, (self.model.nv,))
    return self._d0.replace(
        qpos=qpos.astype(self._d0.qpos.dtype),
        qvel=qvel.astype(self._d0.qpos.dtype),
    )

  def _pixels(self, data: Data) -> jax.Array:
    if not self.pixel_obs:
      return jnp.zeros((0,), data.qpos.dtype)
    h, w = self.pixel_size
    return mjtpu.render(
        self.model, data, width=w, height=h, camera=0, rd=self._render_data
    )

  def reset(self, key: jax.Array, model: Model | None = None) -> State:
    """Resets one env. ``model`` overrides the env's Model for the physics
    (domain randomization: pass one row of a `mjtpu.parallel.randomize`
    batch, or vmap with its axes tree — see `step`)."""
    m = self.model if model is None else model
    key, sub = jax.random.split(key)
    data = self._noisy_init(sub)
    data = mjtpu.forward(m, data)
    obs = self._obs(data)
    zero = jnp.zeros((), obs.dtype)
    return State(
        data=data,
        obs=obs,
        reward=zero,
        done=jnp.zeros((), bool),
        key=key,
        steps=jnp.zeros((), jnp.int32),
        pixels=self._pixels(data),
    )

  def step(self, state: State, action: jax.Array, model: Model | None = None
           ) -> State:
    """Steps one env. ``model`` overrides the env's Model for the physics —
    the domain-randomization hook:

        mb, axes = mjtpu.parallel.randomize(env.model, updates)
        step = jax.jit(jax.vmap(env.step, in_axes=(0, 0, axes)))
        state = step(states, actions, mb)   # env i runs physics row i

    Observation/reward closures keep reading the env's base model constants
    (sizes, healthy ranges); only the dynamics see the randomized fields.
    """
    m = self.model if model is None else model
    ctrl = self._prepare_ctrl(action)
    data = state.data.replace(ctrl=ctrl.astype(state.data.ctrl.dtype))
    for _ in range(self.frame_skip):
      data = mjtpu.step(m, data)
    reward, done = self._reward_done(state.data, data, action)
    steps = state.steps + 1
    done = done | (steps >= self.episode_length)

    # fused auto-reset: where(done) swap in a fresh state (reference
    # zoo/base.py:325-329 semantics, traceable)
    key, sub = jax.random.split(state.key)
    fresh = self._noisy_init(sub)
    fresh = mjtpu.forward(m, fresh)
    data = jax.tree.map(
        lambda a, b: jnp.where(done, a, b), fresh, data
    )
    steps = jnp.where(done, 0, steps)
    obs = self._obs(data)
    return State(
        data=data,
        obs=obs,
        # pin to the obs/physics dtype: _reward_done mixes the caller's
        # action into the reward, and an f64 action (e.g. an x64-mode
        # policy net) would otherwise promote State.reward to f64 while
        # reset() builds it at obs.dtype — a scan-carry dtype mismatch
        reward=jnp.asarray(reward, obs.dtype),
        done=done,
        key=key,
        steps=steps,
        pixels=self._pixels(data),
    )

  # -- per-env definitions ---------------------------------------------------

  def _obs(self, data: Data) -> jax.Array:
    raise NotImplementedError

  def _reward_done(self, prev: Data, data: Data, action):
    raise NotImplementedError

  # -- helpers ---------------------------------------------------------------

  @property
  def dt(self) -> float:
    return float(self.mj_model.opt.timestep) * self.frame_skip

  def _ctrl_cost(self, action, weight):
    return weight * jnp.sum(jnp.square(action))
