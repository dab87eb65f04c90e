"""SAC training on mjtpu zoo envs (reference examples/ SAC training).

Minimal but correct soft actor-critic: twin Q networks, tanh-Gaussian policy
with reparameterized sampling, entropy temperature auto-tuning, replay
buffer on device.  Run:

    python examples/train_sac.py --env hopper --num-envs 128
"""

from __future__ import annotations

import argparse
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
    params.append({
        "w": jax.random.normal(sub, (kin, kout)) * np.sqrt(2.0 / kin),
        "b": jnp.zeros(kout),
    })
  return params


def mlp(params, x):
  for i, layer in enumerate(params):
    x = x @ layer["w"] + layer["b"]
    if i < len(params) - 1:
      x = jax.nn.relu(x)
  return x


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--env", default="hopper")
  ap.add_argument("--num-envs", type=int, default=128)
  ap.add_argument("--buffer", type=int, default=100_000)
  ap.add_argument("--batch", type=int, default=256)
  ap.add_argument("--iters", type=int, default=200)
  ap.add_argument("--lr", type=float, default=3e-4)
  args = ap.parse_args()

  env = zoo.ENVS[args.env](dtype=jnp.float32)
  obs_dim, act_dim = env.observation_size, env.action_size
  key = jax.random.PRNGKey(0)

  key, k1, k2, k3 = jax.random.split(key, 4)
  params = {
      "pi": mlp_init(k1, [obs_dim, 128, 128, 2 * act_dim]),
      "q1": mlp_init(k2, [obs_dim + act_dim, 128, 128, 1]),
      "q2": mlp_init(k3, [obs_dim + act_dim, 128, 128, 1]),
      "log_alpha": jnp.zeros(()),
  }
  target = jax.tree.map(lambda x: x, {"q1": params["q1"], "q2": params["q2"]})
  tx = optax.adam(args.lr)
  opt_state = tx.init(params)
  target_entropy = -float(act_dim)
  gamma, tau = 0.99, 0.005

  def sample_action(params, obs, key):
    out = mlp(params["pi"], obs)
    mean, log_std = out[..., :act_dim], jnp.clip(out[..., act_dim:], -5, 2)
    eps = jax.random.normal(key, mean.shape)
    pre = mean + jnp.exp(log_std) * eps
    act = jnp.tanh(pre)
    logp = jnp.sum(
        -0.5 * (eps**2 + 2 * log_std + np.log(2 * np.pi))
        - jnp.log(1 - act**2 + 1e-6),
        axis=-1,
    )
    return act, logp

  # device-resident ring replay buffer
  buf = {
      "obs": jnp.zeros((args.buffer, obs_dim), jnp.float32),
      "act": jnp.zeros((args.buffer, act_dim), jnp.float32),
      "rew": jnp.zeros((args.buffer,), jnp.float32),
      "next_obs": jnp.zeros((args.buffer, obs_dim), jnp.float32),
      "done": jnp.zeros((args.buffer,), jnp.float32),
  }

  state = jax.vmap(env.reset)(jax.random.split(key, args.num_envs))

  @jax.jit
  def collect(params, state, buf, ptr, key):
    key, sub = jax.random.split(key)
    act, _ = sample_action(params, state.obs, sub)
    next_state = jax.vmap(env.step)(state, act)
    idx = (ptr + jnp.arange(args.num_envs)) % args.buffer
    buf = {
        "obs": buf["obs"].at[idx].set(state.obs),
        "act": buf["act"].at[idx].set(act),
        "rew": buf["rew"].at[idx].set(next_state.reward),
        "next_obs": buf["next_obs"].at[idx].set(next_state.obs),
        "done": buf["done"].at[idx].set(next_state.done.astype(jnp.float32)),
    }
    return next_state, buf, ptr + args.num_envs, key

  @jax.jit
  def update(params, target, opt_state, buf, size, key):
    key, ks, ka, kn = jax.random.split(key, 4)
    idx = jax.random.randint(ks, (args.batch,), 0, jnp.maximum(1, size))
    batch = jax.tree.map(lambda x: x[idx], buf)
    alpha = jnp.exp(params["log_alpha"])

    next_act, next_logp = sample_action(params, batch["next_obs"], kn)
    q_in = jnp.concatenate([batch["next_obs"], next_act], axis=-1)
    q_next = jnp.minimum(
        mlp(target["q1"], q_in)[..., 0], mlp(target["q2"], q_in)[..., 0]
    )
    y = batch["rew"] + gamma * (1 - batch["done"]) * (
        q_next - alpha * next_logp
    )
    y = jax.lax.stop_gradient(y)

    def loss_fn(params):
      q_in = jnp.concatenate([batch["obs"], batch["act"]], axis=-1)
      q1 = mlp(params["q1"], q_in)[..., 0]
      q2 = mlp(params["q2"], q_in)[..., 0]
      q_loss = jnp.mean((q1 - y) ** 2) + jnp.mean((q2 - y) ** 2)

      act, logp = sample_action(params, batch["obs"], ka)
      q_pi_in = jnp.concatenate([batch["obs"], act], axis=-1)
      q_pi = jnp.minimum(
          mlp(jax.lax.stop_gradient(params["q1"]), q_pi_in)[..., 0],
          mlp(jax.lax.stop_gradient(params["q2"]), q_pi_in)[..., 0],
      )
      alpha_d = jnp.exp(params["log_alpha"])
      pi_loss = jnp.mean(jax.lax.stop_gradient(alpha_d) * logp - q_pi)
      alpha_loss = -jnp.mean(
          params["log_alpha"] * jax.lax.stop_gradient(logp + target_entropy)
      )
      return q_loss + pi_loss + alpha_loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state)
    params = optax.apply_updates(params, updates)
    target = jax.tree.map(
        lambda t, p: (1 - tau) * t + tau * p,
        target,
        {"q1": params["q1"], "q2": params["q2"]},
    )
    return params, target, opt_state, loss, key

  ptr = 0
  for it in range(args.iters):
    t0 = time.perf_counter()
    state, buf, ptr, key = collect(params, state, buf, ptr, key)
    size = jnp.minimum(ptr, args.buffer)
    params, target, opt_state, loss, key = update(
        params, target, opt_state, buf, size, key
    )
    jax.block_until_ready(loss)
    if it % 10 == 0:
      sps = args.num_envs * env.frame_skip / (time.perf_counter() - t0)
      print(
          f"iter {it:4d}  loss {float(loss):9.4f}  "
          f"reward {float(state.reward.mean()):8.4f}  {sps:,.0f} env-steps/s"
      )


if __name__ == "__main__":
  main()
