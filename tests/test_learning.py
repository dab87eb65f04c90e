"""End-to-end learning smoke test (reference gpu-tests.yml:11-31 runs the
training examples in CI): a seeded, minutes-scale PPO run on cartpole must
improve mean reward.  An engine bug that corrupts gradients or auto-reset
statistics passes every parity test but fails this.

Run manually / in CI with:  pytest tests/test_learning.py -m integration
"""

import importlib.util
import pathlib
import statistics

import pytest

_EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def _load_train_ppo():
  spec = importlib.util.spec_from_file_location(
      "train_ppo", _EXAMPLES / "train_ppo.py"
  )
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod


@pytest.mark.integration
def test_ppo_cartpole_learns():
  """Causal learning check: a seeded cartpole PPO run must end with higher
  mean rollout reward than the IDENTICAL run with lr ~ 0 (same seed, same
  noise, same auto-reset dynamics — the only difference is whether the
  gradient updates do anything).  Calibration (2026-08-20, CPU f64
  backend): learner last-10 mean ~0.955, control ~0.89; threshold 0.03
  leaves 2x headroom."""
  import jax

  mod = _load_train_ppo()
  common = ["--env", "cartpole", "--num-envs", "256", "--rollout", "16",
            "--iters", "200", "--seed", "0"]
  # run the example in its native f32 (as `python examples/train_ppo.py`
  # does): the parity conftest's x64 mode changes the optimizer/dynamics
  # numerics the calibration below was made under
  prev_x64 = jax.config.jax_enable_x64
  jax.config.update("jax_enable_x64", False)
  try:
    learner = mod.main(common + ["--lr", "1e-2"])
    control = mod.main(common + ["--lr", "1e-9"])
  finally:
    jax.config.update("jax_enable_x64", prev_x64)
  lm = statistics.mean(learner[-10:])
  cm = statistics.mean(control[-10:])
  assert lm > cm + 0.03, (
      f"no learning: learner last-10 mean reward {lm:.4f} vs lr~0 control "
      f"{cm:.4f}; learner curve tail={[round(r, 3) for r in learner[-20:]]}"
  )


def _episode_returns(path):
  import json

  rows = [json.loads(ln) for ln in open(path) if ln.strip()]
  return [r["episode_return"] for r in rows if r["episode_return"] is not None]


@pytest.mark.integration
def test_ppo_hopper_episode_return_improves(tmp_path):
  """Same causal design on hopper, measured in EPISODE RETURN (the metric
  with real headroom: a random policy falls in ~20 steps, a learned one
  survives toward the 200-step limit — r4's near-ceiling per-step
  mean_reward could not show learning).  Learner final episode return must
  beat the lr~0 control AND >= 2x its own initial."""
  import jax

  mod = _load_train_ppo()
  lpath, cpath = tmp_path / "l.jsonl", tmp_path / "c.jsonl"
  common = ["--env", "hopper", "--num-envs", "256", "--rollout", "32",
            "--iters", "100", "--seed", "0", "--episode-length", "200"]
  prev_x64 = jax.config.jax_enable_x64
  jax.config.update("jax_enable_x64", False)
  try:
    mod.main(common + ["--lr", "1e-3", "--log-jsonl", str(lpath)])
    mod.main(common + ["--lr", "1e-9", "--log-jsonl", str(cpath)])
  finally:
    jax.config.update("jax_enable_x64", prev_x64)
  lr = _episode_returns(lpath)
  cr = _episode_returns(cpath)
  assert lr and cr, "no completed episodes recorded"
  l_init = statistics.mean(lr[:5])
  l_final = statistics.mean(lr[-5:])
  c_final = statistics.mean(cr[-5:])
  # calibration (2026-08-21, TPU f32, 512 envs): lr 1e-3 reaches ~1.9x its
  # initial 41 -> ~80 by iter 100 while the lr~0 control stays ~41-46;
  # thresholds at 1.5x/1.3x leave margin for seed/backend variation
  assert l_final > c_final * 1.3, (
      f"learner final ep return {l_final:.1f} not past lr~0 control "
      f"{c_final:.1f}")
  assert l_final >= 1.5 * l_init, (
      f"learner ep return {l_init:.1f} -> {l_final:.1f}: no 1.5x improvement")
