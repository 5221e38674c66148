"""End-to-end variants: LSTM dynamics (carry-packed planner state), MLP
expert arch, and the cheetah env through the full runner plumbing."""

import pytest

from gan_mpc_tpu.config import Config

from tests.test_end_to_end import TINY_OVERRIDES

pytestmark = pytest.mark.slow  # see test_end_to_end.py docstring


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path / "runs")


def test_l2_with_lstm_dynamics_and_mlp_expert(workdir):
    """Exercises the LSTM carry inside the planner state (xc = [x, h, c])
    through planning, warm history carry at eval, and training."""
    from gan_mpc_tpu.runners import l2

    cfg = Config.from_yaml_str(TINY_OVERRIDES).replace(
        runtime__workdir=workdir,
        mpc__model__dynamics__use="lstm",
        expert_prediction__model__use="mlp",
    )
    out = l2.run(cfg, log_fn=None)
    h = out["history"]
    assert all(v == v for v in h["cost_train_losses"])  # no NaN
    assert all(v == v for v in h["dynamics_train_losses"])
    assert out["avg_reward"] >= 0.0


def test_gan_on_cheetah_tiny(workdir):
    """17-dim obs / 6-dim action path through collection, expert
    prediction, dynamics, critic, and bilevel cost training."""
    from gan_mpc_tpu.runners import gan

    cfg = Config.from_yaml_str(TINY_OVERRIDES).replace(
        runtime__workdir=workdir,
        env__name="cheetah_run",
        env__expert_episode_steps=120,
        env__imitator={
            "name": "cheetah_run",
            "physics": [{"key": "body_mass_torso", "value": 2.0}],
        },
        mpc__train__min_expert_reward=0.5,
        mpc__train__dynamics__max_interactions_per_episode=15,
        mpc__evaluate__max_interactions=15,
    )
    out = gan.run(cfg, log_fn=None)
    h = out["history"]
    assert all(v == v for v in h["critic_train_losses"])
    assert all(v == v for v in h["cost_train_losses"])
