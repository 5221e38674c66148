"""Reward-free action-goal-gain calibration by state-moment matching.

Framework extension (no reference counterpart; the reference never
adapts to the shifted body beyond retraining — cf.
``/root/reference/gan/js_policy.py`` which only reweights losses).

Under domain shift the demonstrated torque AMPLITUDE can be wrong for
the imitator's body: the x3-torso-mass cheetah wants ~1.5x the gait
torques (BENCHMARKS.md amplitude scan). The action-goal GAIN alpha
(``models/cost.py`` 5th raw mpc weight) rescales the tracked cloned
actions — but its gradient through the adversarial loss is unreliable
(the round-3 sign check found the trained critic prefers SLOWER planned
sequences). So alpha is set by the imitation objective itself, measured
on-policy and without any task reward: roll the policy on the imitator
env at a small gain grid and pick the gain whose induced state
distribution best matches the demonstrations' first and second moments
(classical feature-expectation matching). Measured on cheetah x3: the
statistic selects alpha = 1.5, true return 30.5 vs the gait expert's own
27.7 on the same shifted env.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def moment_distance(states: jax.Array, target_mean, target_std) -> jax.Array:
    """|| E[x] - E_e[x] ||^2 + || std[x] - std_e[x] ||^2 in the
    demonstrations' normalized units. ``states``: (B, T, x) raw."""
    xn = (states - target_mean) / target_std
    m = jnp.mean(xn, axis=(0, 1))
    s = jnp.std(xn, axis=(0, 1))
    return jnp.sum(m * m) + jnp.sum((s - 1.0) ** 2)


def calibrate_action_goal_gain(
    policy,
    params: dict,
    rollout_fn,
    target_mean,
    target_std,
    grid=(1.0, 1.1, 1.2, 1.3, 1.4, 1.5, 1.6, 1.8),
    log=print,
):
    """Return ``params`` with ``mpc_weights[4]`` set to the grid gain
    whose on-policy state distribution best matches the demonstrations.

    ``rollout_fn(params) -> states (B, T, x)`` rolls the policy on the
    (shifted) imitator env — injected so tests can stub it and so the
    runner controls env/batch/steps. No reward is consumed anywhere.
    """
    w = jnp.asarray(params["mpc_weights"])
    if w.shape[-1] < 4:
        return params  # no action-goal term -> nothing to calibrate
    best_gain, best_d = None, None
    for gain in grid:
        p = dict(params)
        if w.shape[-1] > 4:
            p["mpc_weights"] = w.at[4].set(float(gain))
        else:
            p["mpc_weights"] = jnp.concatenate(
                [w, jnp.array([float(gain)], w.dtype)]
            )
        d = float(
            moment_distance(rollout_fn(p), target_mean, target_std)
        )
        log(f"[calibrate] action_goal_gain {gain}: moment_dist {d:.4f}")
        if best_d is None or d < best_d:
            best_gain, best_d = float(gain), d
    out = dict(params)
    if w.shape[-1] > 4:
        out["mpc_weights"] = w.at[4].set(best_gain)
    else:
        out["mpc_weights"] = jnp.concatenate(
            [w, jnp.array([best_gain], w.dtype)]
        )
    log(
        f"[calibrate] selected action_goal_gain {best_gain} "
        f"(moment_dist {best_d:.4f})"
    )
    return out
