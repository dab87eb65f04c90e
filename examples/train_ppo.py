"""PPO training on mjtpu zoo envs (reference examples/ PPO training).

Pure JAX training loop: env batch is vmapped (optionally sharded over a TPU
mesh with mjtpu.parallel), rollouts + GAE + clipped-objective updates are one
jitted step.  Run:

    python examples/train_ppo.py --env halfcheetah --num-envs 2048
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import mjtpu.zoo as zoo


def mlp_init(key, sizes):
  params = []
  for kin, kout in zip(sizes[:-1], sizes[1:]):
    key, sub = jax.random.split(key)
    w = jax.random.normal(sub, (kin, kout)) * np.sqrt(2.0 / kin)
    params.append({"w": w, "b": jnp.zeros(kout)})
  return params


def mlp(params, x):
  for i, layer in enumerate(params):
    x = x @ layer["w"] + layer["b"]
    if i < len(params) - 1:
      x = jnp.tanh(x)
  return x


def main(argv=None):
  ap = argparse.ArgumentParser()
  ap.add_argument("--env", default="halfcheetah")
  ap.add_argument("--num-envs", type=int, default=512)
  ap.add_argument("--rollout", type=int, default=32)
  ap.add_argument("--iters", type=int, default=20)
  ap.add_argument("--lr", type=float, default=3e-4)
  ap.add_argument("--seed", type=int, default=0)
  ap.add_argument(
      "--log-jsonl", default=None,
      help="append one JSON row per iteration (learning-curve artifact)")
  ap.add_argument(
      "--randomize", action="store_true",
      help="domain randomization: per-env friction/gain/mass (+-20-30%%)")
  ap.add_argument(
      "--episode-length", type=int, default=None,
      help="override the env's episode time limit (shorter limits make "
           "episode returns land inside a short training run)")
  args = ap.parse_args(argv)

  env = zoo.ENVS[args.env](dtype=jnp.float32)
  if args.episode_length is not None:
    env.episode_length = args.episode_length
  key = jax.random.PRNGKey(args.seed)
  obs_dim, act_dim = env.observation_size, env.action_size

  # domain randomization: every env trains under its own physics row
  # (mjtpu.parallel.randomize; the policy must become robust to the sweep)
  mb, m_axes = None, None
  if args.randomize:
    from mjtpu import parallel

    mjm = env.mj_model
    key, kf, kg, km = jax.random.split(key, 4)
    B = args.num_envs
    updates = {
        "geom_friction": jnp.asarray(np.array(mjm.geom_friction))
        * jax.random.uniform(kf, (B, mjm.ngeom, 1), minval=0.7, maxval=1.3),
        "body_mass": jnp.asarray(np.array(mjm.body_mass))
        * jax.random.uniform(km, (B, mjm.nbody), minval=0.8, maxval=1.2),
    }
    if mjm.nu:
      updates["actuator_gainprm"] = (
          jnp.asarray(np.array(mjm.actuator_gainprm))
          * jax.random.uniform(kg, (B, mjm.nu, 1), minval=0.8, maxval=1.2))
    mb, m_axes = parallel.randomize(env.model, updates)

  key, k1, k2 = jax.random.split(key, 3)
  pi_params = mlp_init(k1, [obs_dim, 64, 64, act_dim])
  v_params = mlp_init(k2, [obs_dim, 64, 64, 1])
  log_std = jnp.zeros(act_dim)
  params = {"pi": pi_params, "v": v_params, "log_std": log_std}

  tx = optax.adam(args.lr)
  opt_state = tx.init(params)

  state = jax.vmap(env.reset)(jax.random.split(key, args.num_envs))

  def rollout(params, state, ep_ret, key):
    def one_step(carry, _):
      state, ep_ret, key = carry
      key, sub = jax.random.split(key)
      mean = mlp(params["pi"], state.obs)
      std = jnp.exp(params["log_std"])
      act = mean + std * jax.random.normal(sub, mean.shape)
      logp = -0.5 * jnp.sum(
          ((act - mean) / std) ** 2 + 2 * params["log_std"] + np.log(2 * np.pi),
          axis=-1,
      )
      value = mlp(params["v"], state.obs)[..., 0]
      if mb is not None:
        next_state = jax.vmap(env.step, in_axes=(0, 0, m_axes))(state, act, mb)
      else:
        next_state = jax.vmap(env.step)(state, act)
      # episode-return accounting: accumulate through the final (done)
      # step, emit the completed return, reset for the auto-reset env
      ep_ret = ep_ret + next_state.reward
      comp_ret = jnp.where(next_state.done, ep_ret, 0.0)
      ep_ret = jnp.where(next_state.done, 0.0, ep_ret)
      out = (state.obs, act, logp, value, next_state.reward,
             next_state.done, comp_ret)
      return (next_state, ep_ret, key), out

    (state, ep_ret, _), (obs, act, logp, value, reward, done, comp_ret) = (
        jax.lax.scan(one_step, (state, ep_ret, key), None,
                     length=args.rollout))
    return state, ep_ret, obs, act, logp, value, reward, done, comp_ret

  def gae(value, reward, done, gamma=0.99, lam=0.95):
    # standard GAE backward scan
    def bwd(carry, x):
      v, next_v, r, d = x
      delta = r + gamma * next_v * (1 - d) - v
      carry = delta + gamma * lam * (1 - d) * carry
      return carry, carry

    next_value = jnp.concatenate([value[1:], value[-1:]])
    _, adv = jax.lax.scan(
        bwd,
        jnp.zeros_like(value[0]),
        (value, next_value, reward, done.astype(value.dtype)),
        reverse=True,
    )
    return adv

  @jax.jit
  def train_iter(params, opt_state, state, ep_ret, key):
    key, k_roll = jax.random.split(key)
    (state, ep_ret, obs, act, logp_old, value, reward, done,
     comp_ret) = rollout(params, state, ep_ret, k_roll)
    adv = gae(value, reward, done)
    ret = adv + value
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)

    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    obs_f, act_f, logp_f, adv_f, ret_f = map(flat, (obs, act, logp_old, adv, ret))

    def loss_fn(params):
      mean = mlp(params["pi"], obs_f)
      std = jnp.exp(params["log_std"])
      logp = -0.5 * jnp.sum(
          ((act_f - mean) / std) ** 2 + 2 * params["log_std"] + np.log(2 * np.pi),
          axis=-1,
      )
      ratio = jnp.exp(logp - logp_f)
      clipped = jnp.clip(ratio, 0.8, 1.2)
      pi_loss = -jnp.mean(jnp.minimum(ratio * adv_f, clipped * adv_f))
      v = mlp(params["v"], obs_f)[..., 0]
      v_loss = jnp.mean((v - ret_f) ** 2)
      return pi_loss + 0.5 * v_loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state)
    params = optax.apply_updates(params, updates)
    n_done = done.sum()
    ep_stats = (comp_ret.sum(), n_done)
    return params, opt_state, state, ep_ret, key, loss, reward.mean(), ep_stats

  rewards = []
  ep_ret = jnp.zeros(args.num_envs, jnp.float32)
  last_ep_return = None
  log_f = open(args.log_jsonl, "a") if args.log_jsonl else None
  for it in range(args.iters):
    t0 = time.perf_counter()
    params, opt_state, state, ep_ret, key, loss, mean_rew, ep_stats = (
        train_iter(params, opt_state, state, ep_ret, key))
    jax.block_until_ready(loss)
    sps = args.num_envs * args.rollout * env.frame_skip / (
        time.perf_counter() - t0
    )
    rewards.append(float(mean_rew))
    comp_sum, comp_cnt = float(ep_stats[0]), int(ep_stats[1])
    if comp_cnt:
      last_ep_return = comp_sum / comp_cnt
    ep_str = ("---" if last_ep_return is None
              else f"{last_ep_return:8.2f}")
    print(
        f"iter {it:3d}  loss {float(loss):8.4f}  reward {float(mean_rew):8.4f}"
        f"  ep_return {ep_str} ({comp_cnt} eps)  {sps:,.0f} env-steps/s"
    )
    if log_f:
      import json

      log_f.write(json.dumps({
          "env": args.env, "seed": args.seed, "iter": it,
          "loss": float(loss), "mean_reward": float(mean_rew),
          "episode_return": last_ep_return, "episodes_completed": comp_cnt,
          "env_steps_per_sec": round(sps),
          "env_steps": (it + 1) * args.num_envs * args.rollout
          * env.frame_skip,
      }) + "\n")
      log_f.flush()
  if log_f:
    log_f.close()
  return rewards


if __name__ == "__main__":
  main()
