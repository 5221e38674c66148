"""Expert trajectory collection with scripted controllers.

The reference assumes an EXTERNAL RL pipeline writes
``expert_trajectories/{env}/trajectories.json`` (nothing in that repo
produces it — SURVEY.md §1). To make this framework self-contained, each
pure-JAX env ships a scripted expert (energy-shaping swingup, LQR-style
balance) good enough to clear the reference's >500-reward quality gate;
``collect_expert_trajectories`` rolls it out batched on device and returns
the reference-schema TrajectorySet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gan_mpc_tpu.data.normalizer import Normalizer
from gan_mpc_tpu.data.trajectories import TrajectorySet
from gan_mpc_tpu.envs.rollout import batched_rollout


def scripted_expert(env):
    """Return ``policy_fn(params, history_x, history_u) -> action`` for the
    given env (params unused; histories are raw observations because
    collection runs with an identity normalizer)."""

    if env.name == "pendulum_swingup":
        p = env.default_params()
        m, length = p.body_mass_pole, p.geom_size_pole
        inertia = m * length**2 / 3.0
        lc = length / 2.0
        e_top = m * p.gravity * lc

        def policy(params, history_x, history_u):
            del params, history_u
            cos_th, sin_th, thd = history_x[-1]
            energy = 0.5 * inertia * thd**2 + m * p.gravity * lc * cos_th
            pump = 2.0 * (e_top - energy) * jnp.sign(thd)
            th = jnp.arctan2(sin_th, cos_th)
            stabilize = -8.0 * th - 2.0 * thd
            near_top = jnp.abs(th) < 0.35
            u = jnp.where(near_top, stabilize, pump)
            return jnp.clip(jnp.array([u]), -1.0, 1.0)

        return policy

    if env.name == "cartpole_balance":

        def policy(params, history_x, history_u):
            del params, history_u
            x, cos_th, sin_th, xd, thd = history_x[-1]
            th = jnp.arctan2(sin_th, cos_th)
            # hand-tuned stabilizing feedback around upright
            u = 18.0 * th + 3.0 * thd + 0.9 * x + 1.6 * xd
            return jnp.clip(jnp.array([u]), -1.0, 1.0)

        return policy

    raise ValueError(f"no scripted expert for env {env.name!r}")


def collect_expert_trajectories(
    env,
    num_trajectories: int,
    key: jax.Array,
    num_steps: int = 1000,
    env_params=None,
) -> TrajectorySet:
    """Batched on-device rollout of the scripted expert."""
    env_params = env_params if env_params is not None else env.default_params()
    policy = scripted_expert(env)
    norm = Normalizer.identity(env.obs_size, env.act_size)
    ep = jax.jit(
        lambda k: batched_rollout(
            env, env_params, policy, None, norm, k, num_steps, 1,
            num_trajectories,
        )
    )(key)
    return TrajectorySet(
        states=np.asarray(ep.states),
        actions=np.asarray(ep.actions),
        rewards=np.asarray(ep.rewards),
    )
