"""Reward-free action-goal-gain calibration (training/calibrate.py)."""

import jax.numpy as jnp
import numpy as np

from gan_mpc_tpu.training.calibrate import (
    calibrate_action_goal_gain,
    moment_distance,
)


def test_moment_distance_zero_at_matching_moments():
    rng = np.random.default_rng(0)
    mean, std = jnp.array([1.0, -2.0]), jnp.array([0.5, 2.0])
    x = mean + std * jnp.asarray(rng.standard_normal((4, 50000, 2)))
    d = float(moment_distance(x, mean, std))
    assert d < 1e-2, d
    # shifted distribution reads as distant
    d2 = float(moment_distance(x + 1.0, mean, std))
    assert d2 > 1.0


def test_calibration_selects_moment_matching_gain():
    """Stubbed rollout whose state distribution matches the target only
    at gain 1.4 — calibration must pick it and write mpc_weights[4]."""
    target_mean, target_std = jnp.zeros((3,)), jnp.ones((3,))
    rng = np.random.default_rng(1)
    base = jnp.asarray(rng.standard_normal((2, 2000, 3)))

    def rollout_fn(params):
        gain = float(params["mpc_weights"][4])
        # states drift away from the target mean as |gain - 1.4| grows
        return base + (gain - 1.4)

    params = {"mpc_weights": jnp.array([-2.0, 3.0, -3.0, 2.0, 1.0])}
    out = calibrate_action_goal_gain(
        None,
        params,
        rollout_fn,
        target_mean,
        target_std,
        grid=(1.0, 1.2, 1.4, 1.6),
        log=lambda *_: None,
    )
    assert abs(float(out["mpc_weights"][4]) - 1.4) < 1e-6
    # original params untouched
    assert float(params["mpc_weights"][4]) == 1.0


def test_calibration_appends_fifth_weight_when_missing():
    params = {"mpc_weights": jnp.array([-2.0, 3.0, -3.0, 2.0])}
    out = calibrate_action_goal_gain(
        None,
        params,
        lambda p: jnp.zeros((1, 10, 2)) + float(p["mpc_weights"][4]),
        jnp.array([0.7, 0.7]),
        jnp.ones((2,)),
        grid=(0.5, 0.7, 0.9),
        log=lambda *_: None,
    )
    assert out["mpc_weights"].shape == (5,)
    assert abs(float(out["mpc_weights"][4]) - 0.7) < 1e-6


def test_calibration_noop_without_action_goal_term():
    params = {"mpc_weights": jnp.array([-2.0, 3.0, -3.0])}
    out = calibrate_action_goal_gain(
        None, params, None, jnp.zeros((2,)), jnp.ones((2,))
    )
    assert out is params
