"""Evaluate policies in the REAL dm_control environments (oracle path).

The reference measures rewards by rolling its policy in dm_control
(``/root/reference/utils.py:254-306``). The TPU framework trains and
evaluates entirely in its pure-JAX envs; this module closes the parity
loop by re-evaluating any trained policy inside the actual MuJoCo suite
task — same observation flattening (``/root/reference/utils.py:103-108``)
and episode protocol — so reward numbers are directly comparable to
anything the reference could produce. Host-side and import-guarded:
dm_control is an optional oracle, never a runtime dependency.
"""

from __future__ import annotations

import numpy as np

_SUITE_NAMES = {
    "pendulum_swingup": ("pendulum", "swingup"),
    "cartpole_balance": ("cartpole", "balance"),
    "cheetah_run": ("cheetah", "run"),
    "walker_walk": ("walker", "walk"),
    "humanoid_stand": ("humanoid", "stand"),
    "humanoid_walk": ("humanoid", "walk"),
}


def dm_control_available() -> bool:
    try:
        import dm_control.suite  # noqa: F401

        return True
    except Exception:
        return False


def flatten_observation(obs_dict) -> np.ndarray:
    """dict-of-arrays -> flat vector, the reference's flattening
    (``/root/reference/utils.py:103-108``: concatenate values in dict
    order, scalars promoted)."""
    parts = []
    for v in obs_dict.values():
        parts.append(np.atleast_1d(np.asarray(v, dtype=np.float64)))
    return np.concatenate(parts)


def evaluate_in_dm_control(
    env_name: str,
    policy_fn,
    params,
    normalizer,
    history: int = 1,
    num_episodes: int = 3,
    max_steps: int = 1000,
    seed: int = 0,
):
    """Roll ``policy_fn(params, history_x, history_u) -> action`` in the
    dm_control suite task; returns (mean_return, per_episode_returns).

    ``policy_fn`` sees NORMALIZED observations and emits raw actions, the
    same contract as the pure-JAX rollouts (envs/rollout.py), so a policy
    trained in this framework drops in unchanged.
    """
    import jax.numpy as jnp
    from dm_control import suite

    domain, task = _SUITE_NAMES[env_name]
    returns = []
    for ep in range(num_episodes):
        env = suite.load(
            domain, task, task_kwargs={"random": seed + ep}
        )
        ts = env.reset()
        obs = flatten_observation(ts.observation)
        hx = [normalizer.normalize_state(jnp.asarray(obs, jnp.float32))] * (
            history + 1
        )
        hu = [jnp.zeros(env.action_spec().shape, jnp.float32)] * history
        total = 0.0
        for _ in range(max_steps):
            u = policy_fn(
                params,
                jnp.stack(hx[-(history + 1) :]),
                jnp.stack(hu[-history:]),
            )
            u = np.asarray(u, dtype=np.float64)
            ts = env.step(u)
            total += float(ts.reward or 0.0)
            obs = flatten_observation(ts.observation)
            hx.append(
                normalizer.normalize_state(jnp.asarray(obs, jnp.float32))
            )
            hu.append(jnp.asarray(u, jnp.float32))
            if ts.last():
                break
        returns.append(total)
    return float(np.mean(returns)), returns
