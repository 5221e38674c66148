"""End-to-end smoke tests: expert -> L2-MPC -> GAN-MPC on pendulum with a
tiny configuration (small nets / few steps so CI stays fast).

Marked ``slow``: with test_end_to_end_variants and the fused-epoch
subprocess cases, these carry ~75% of the suite's wall-clock (compile-
bound on this 1-core box). Fast iteration path: ``pytest tests/ -m "not
slow" -q`` (~10 min); the full suite stays the driver/CI entry point."""

import jax
import pytest

from gan_mpc_tpu.config import Config

pytestmark = pytest.mark.slow

TINY_OVERRIDES = """
seed: 0
env:
  name: pendulum_swingup
  expert_episode_steps: 400
  imitator:
    name: pendulum_swingup
    physics:
      - {key: body_mass_pole, value: 1.0}
mpc:
  normalizer: {state: standard_norm, action: identity}
  horizon: 3
  history: 1
  solver: {max_iterations: 12, grad_norm_tol: 1.0e-4, bilevel: dense}
  model:
    cost:
      weights: {action: -2.0, state: 3.0, terminal: -3.0}
      mlp: {hidden: [16], features_out: 4}
    dynamics:
      use: mlp
      mlp: {hidden: [24, 24]}
      lstm: {features: 8, hidden: [16]}
    critic:
      use: lstm
      lstm: {features: 8, hidden: [16]}
    expert: {load_id: null}
  train:
    num_epochs: 1
    num_trajectories: 3
    trajectory_len: 60
    min_expert_reward: 1.0
    cost:
      num_updates: 1
      batch_size: 8
      learning_rate: 1.0e-5
      polyak_factor: 0.9
      no_grads: [dynamics_params, expert_params]
    dynamics:
      num_episodes: 1
      max_interactions_per_episode: 30
      replay_buffer_size: 500
      num_updates: 1
      batch_size: 8
      learning_rate: 1.0e-5
      discount_factor: 0.9
      teacher_forcing_factor: 0.7
      no_grads: [mpc_weights, cost_params, expert_params]
    critic:
      num_updates: 1
      batch_size: 8
      learning_rate: 1.0e-5
      no_grads: [mpc_weights, cost_params, dynamics_params, expert_params]
  evaluate: {max_interactions: 30, num_runs_for_avg: 1}
expert_prediction:
  model:
    use: lstm
    mlp: {hidden: [16]}
    lstm: {features: 16, hidden: [16]}
  train:
    num_epochs: 2
    batch_size: 16
    seqlen: 6
    learning_rate: 1.0e-4
    discount_factor: 0.9
    teacher_forcing_factor: 0.7
  eval_runs: 1
runtime:
  workdir: PLACEHOLDER
  num_parallel_envs: 1
"""


@pytest.fixture(scope="module")
def tiny_config(tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("runs"))
    cfg = Config.from_yaml_str(TINY_OVERRIDES)
    return cfg.replace(runtime__workdir=workdir)


@pytest.fixture(scope="module")
def expert_result(tiny_config):
    from gan_mpc_tpu.runners import expert

    return expert.run(tiny_config, log_fn=None)


def test_expert_runner_trains_and_saves(expert_result, tiny_config):
    import os

    assert os.path.exists(
        os.path.join(expert_result["run_dir"], "params.msgpack")
    )
    assert os.path.exists(
        os.path.join(expert_result["run_dir"], "config.json")
    )
    assert expert_result["train_loss"] > 0.0
    # training reduced the loss vs. a couple orders of magnitude sanity
    assert expert_result["test_loss"] < 1e4


def test_l2_runner_end_to_end(expert_result, tiny_config):
    from gan_mpc_tpu.runners import l2

    out = l2.run(tiny_config, log_fn=None)
    assert out["avg_reward"] >= 0.0
    h = out["history"]
    assert len(h["cost_train_losses"]) == 1
    assert len(h["dynamics_train_losses"]) >= 1
    assert all(map(lambda v: v == v, h["cost_train_losses"]))  # no NaN
    import json
    import os

    assert os.path.exists(os.path.join(out["run_dir"], "params.msgpack"))
    # the held-out fresh-seed eval is stamped next to `reward` with
    # seeds disjoint from the run's own key chain (VERDICT r4 item 1)
    with open(os.path.join(out["run_dir"], "config.json")) as fp:
        stamp = json.load(fp)
    fe = stamp["fresh_eval"]
    assert fe["num_episodes"] == 16 and len(fe["episodes"]) == 16
    assert fe["mean"] == pytest.approx(
        sum(fe["episodes"]) / 16, abs=0.1
    )
    assert fe["episodes"] == sorted(fe["episodes"])


def test_gan_runner_end_to_end(expert_result, tiny_config):
    from gan_mpc_tpu.runners import gan

    out = gan.run(tiny_config, log_fn=None)
    h = out["history"]
    assert len(h["critic_train_losses"]) == 1
    assert len(h["cost_train_losses"]) == 1
    assert all(v == v for v in h["critic_train_losses"])  # no NaN
    assert all(v == v for v in h["cost_train_losses"])


def test_gan_runner_dagger_rounds(expert_result, tiny_config):
    """DAgger refinement: corrective collection + predictor fine-tune +
    continued adversarial training must run end to end and move the
    expert predictor params (which are frozen everywhere else)."""
    from gan_mpc_tpu.runners import gan

    cfg = tiny_config.replace(
        runtime__fused_epochs=True,
        expert_prediction__dagger={
            "rounds": 1,
            "num_segments": 6,
            "segment_steps": 10,
            "policy_episodes": 2,
            "finetune_epochs": 1,
            # 0 keeps the test off the second fused-epoch compile (the
            # continuation reuses the SAME _run_fused_epochs the main
            # loop already covers); the no-continuation eval branch runs
            "extra_epochs": 0,
        },
        mpc__evaluate__every_epochs=1,
        mpc__evaluate__midrun_episodes=1,
        # keep_best would re-rank candidates and may legitimately select a
        # PRE-DAgger checkpoint (honest selection is score-driven); disable
        # it so run() deterministically returns the refined params and the
        # moved-predictor assertion below tests the machinery, not luck
        mpc__evaluate__keep_best=False,
    )
    out = gan.run(cfg, log_fn=None)
    assert out["avg_reward"] >= 0.0
    # the predictor was refined: expert_params moved from the pretrained
    # checkpoint (everywhere else they are optax-masked frozen)
    import jax.numpy as jnp

    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        expert_result["params"],
        out["params"]["expert_params"],
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


def test_setup_init_from_run(tiny_config, expert_result, tmp_path):
    """mpc.train.init_from_run warm-starts a run from a SAVED run's
    params.msgpack (continuation training, e.g. extra DAgger rounds on an
    already-trained imitator)."""
    import os

    import jax.numpy as jnp

    from gan_mpc_tpu.runners import l2
    from gan_mpc_tpu.utils import io

    ctx = l2.setup(tiny_config)
    # fabricate a "saved run": perturb one cost param so the warm start is
    # distinguishable from a fresh init
    saved = jax.tree_util.tree_map(lambda a: a + 1.0, ctx["params"])
    run_dir = str(tmp_path / "0")
    io.save_params(saved, os.path.join(run_dir, "params.msgpack"))

    cfg = tiny_config.replace(mpc__train__init_from_run=run_dir)
    ctx2 = l2.setup(cfg)
    got = jax.tree_util.tree_leaves(ctx2["params"])
    want = jax.tree_util.tree_leaves(saved)
    assert all(jnp.array_equal(a, b) for a, b in zip(got, want))


def test_l2_deterministic_given_seed(tiny_config, expert_result):
    """Same seed -> identical training result (PRNG discipline)."""
    from gan_mpc_tpu.runners import l2

    a = l2.run(tiny_config, log_fn=None)
    b = l2.run(tiny_config, log_fn=None)
    assert a["history"]["cost_train_losses"] == b["history"]["cost_train_losses"]
    wa = jax.tree_util.tree_leaves(a["params"]["cost_params"])
    wb = jax.tree_util.tree_leaves(b["params"]["cost_params"])
    for x, y in zip(wa, wb):
        assert (x == y).all()


def test_l2_checkpoint_resume(tiny_config, expert_result, tmp_path):
    """Epoch-level checkpointing: a CRASHED run resumes past epoch 1,
    and a COMPLETED run clears its crash-resume state (so the next
    fresh invocation does not silently resume a finished run)."""
    from gan_mpc_tpu.runners import l2

    cfg = tiny_config.replace(
        runtime__checkpoint={"every_epochs": 1, "keep": 2},
        mpc__train__num_epochs=2,
    )

    class Crash(RuntimeError):
        pass

    def crash_after_epoch_1(msg):
        # the epoch-1 checkpoint is saved before this log line
        if msg.startswith("[l2] epoch 1 "):
            raise Crash(msg)

    with pytest.raises(Crash):
        l2.run(cfg, log_fn=crash_after_epoch_1)
    logs2 = []
    out = l2.run(cfg, log_fn=logs2.append)
    assert any("resumed from checkpoint at epoch 1" in m for m in logs2)
    # only epoch 2 was trained in the second run
    assert sum(1 for m in logs2 if m.startswith("[l2] epoch")) == 1
    assert out["avg_reward"] >= 0.0
    # completion cleared the crash-resume state
    ckpt = l2.checkpointer_for(cfg, "l2")
    assert ckpt.latest_step() is None
    ckpt.close()
    # a third run therefore starts from scratch
    logs3 = []
    l2.run(cfg, log_fn=logs3.append)
    assert not any("resumed" in m for m in logs3)
    assert sum(1 for m in logs3 if m.startswith("[l2] epoch")) == 2


def test_l2_periodic_eval_and_best_selection(tiny_config, expert_result):
    """mpc.evaluate.every_epochs triggers mid-training evals and the saved
    params are the best-evaluated ones."""
    from gan_mpc_tpu.runners import l2

    cfg = tiny_config.replace(
        mpc__train__num_epochs=2,
        mpc__evaluate__every_epochs=1,
    )
    logs = []
    out = l2.run(cfg, log_fn=logs.append)
    evals = [m for m in logs if "eval_reward" in m]
    assert len(evals) == 2
    assert out["avg_reward"] >= 0.0


def test_expert_loads_under_arch_mismatch(expert_result, tiny_config):
    """A saved expert must be rebuilt from ITS OWN config.json even when
    the current YAML specifies a different architecture
    (/root/reference/utils.py:216-227 semantics)."""
    from gan_mpc_tpu.runners.expert import load_pretrained_expert

    # current config now asks for a DIFFERENT expert arch/size
    mismatched = tiny_config.replace(
        expert_prediction__model__use="mlp",
        expert_prediction__model__mlp__hidden=[7],
    )
    model, params = load_pretrained_expert(mismatched, 3, 1)
    # reconstructed from the SAVED run: lstm with the saved sizes
    assert model.arch == "lstm"
    assert model.features == 16
    # and the params actually drive the model
    import jax.numpy as jnp

    hx = jnp.zeros((2, 3))
    carry = model.warm_carry(params, hx)
    goal_X, init_U = model.generate(params, carry, 3)
    assert goal_X.shape == (4, 3) and init_U.shape == (3, 1)
