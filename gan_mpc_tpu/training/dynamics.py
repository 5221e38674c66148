"""On-policy dynamics model trainer.

Capability parity with ``/root/reference/norm/dynamics_trainer.py``:

  * multi-step prediction loss — unroll the learned dynamics over a window,
    open- or closed-loop via an in-scan teacher-forcing switch, discounted
    squared error (``predict_loss``, ``:13-42``);
  * SGD inside ``lax.scan`` over minibatches (``train_per_update``);
  * warm-start updates on the expert dataset at the first epoch
    (``:142-155``);
  * on-policy episodes collected with the eval policy — here fully
    on-device (one jitted scan, batchable over many envs) instead of the
    reference's per-step host<->device ping-pong.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from gan_mpc_tpu.data.buffers import ReplayBuffer
from gan_mpc_tpu.data.windows import minibatch_indices
from gan_mpc_tpu.training.common import discounted_sum


def multistep_prediction_loss(
    dynamics_model, dynamics_params, xseq, useq, next_xseq, gamma, teacher_forcing
):
    """Discounted multi-step prediction error for one (seqlen, ·) window."""
    x_size = xseq.shape[-1]

    def step(carry, inputs):
        x_prev, dcarry = carry
        x_t, u_t = inputs
        x = jnp.where(teacher_forcing, x_t, x_prev)
        xc = jnp.concatenate([x, dcarry], axis=-1)
        next_xc = dynamics_model(xc, u_t, 0, dynamics_params)
        return (next_xc[:x_size], next_xc[x_size:]), next_xc[:x_size]

    init = (xseq[0], dynamics_model.zero_carry())
    _, pred = jax.lax.scan(step, init, (xseq, useq))
    return jnp.sum(discounted_sum((pred - next_xseq) ** 2, gamma))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _update_scan(dynamics_model, opt, params, opt_state, perm, dataset, gamma, tf):
    X, U, Y = dataset

    def body(carry, p):
        params, opt_state = carry

        def loss_fn(params):
            losses = jax.vmap(
                lambda x, u, y: multistep_prediction_loss(
                    dynamics_model,
                    params["dynamics_params"],
                    x,
                    u,
                    y,
                    gamma,
                    tf,
                )
            )(X[p], U[p], Y[p])
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), perm)
    return params, opt_state, jnp.mean(losses)


def _run_updates(
    dynamics_model,
    opt,
    params,
    opt_state,
    dataset,
    num_updates,
    batch_size,
    gamma,
    teacher_forcing_factor,
    key,
    update_offset=0,
):
    datasize = dataset[0].shape[0]
    steps = max(datasize // batch_size, 1)
    losses = []
    for up in range(1, num_updates + 1):
        key, sub = jax.random.split(key)
        perm = minibatch_indices(sub, datasize, steps, batch_size)
        tf = jnp.asarray(
            (update_offset + up) <= num_updates * teacher_forcing_factor
        )
        params, opt_state, loss = _update_scan(
            dynamics_model, opt, params, opt_state, perm, dataset, gamma, tf
        )
        losses.append(float(loss))
    return params, opt_state, losses


def train_dynamics(
    dynamics_model,
    optimizer,
    params: dict,
    opt_state,
    expert_dataset,
    replay_buffer: ReplayBuffer,
    collect_fn: Callable,
    normalizer,
    num_episodes: int,
    num_updates: int,
    batch_size: int,
    discount_factor: float,
    teacher_forcing_factor: float,
    key: jax.Array,
    epoch: int,
    warm_start_updates: int = 3,
    expert_updates: int = 0,
):
    """One epoch of on-policy dynamics training.

    ``collect_fn(params, key) -> EpisodeData`` runs the eval policy in the
    (possibly domain-shifted) env, entirely on device, possibly batched
    over parallel envs (states then have shape (B, T, x)).

    Returns (params, opt_state, replay_buffer, episode_returns, losses).
    """
    losses = []
    if epoch == 1 and warm_start_updates > 0:
        key, sub = jax.random.split(key)
        params, opt_state, warm = _run_updates(
            dynamics_model,
            optimizer,
            params,
            opt_state,
            expert_dataset,
            num_updates=warm_start_updates,
            batch_size=batch_size,
            gamma=discount_factor,
            teacher_forcing_factor=1.0,
            key=sub,
        )
        losses.extend(warm)
    if expert_updates > 0:
        # keep refreshing on the expert distribution every epoch — pure
        # on-policy data collapses the model onto wherever the (initially
        # poor) policy visits, which starves the planner of control
        # sensitivity in the regions that matter
        key, sub = jax.random.split(key)
        params, opt_state, extra = _run_updates(
            dynamics_model,
            optimizer,
            params,
            opt_state,
            expert_dataset,
            num_updates=expert_updates,
            batch_size=batch_size,
            gamma=discount_factor,
            teacher_forcing_factor=1.0,
            key=sub,
        )
        losses.extend(extra)

    episode_returns = []
    for ep in range(num_episodes):
        key, k_collect, k_train = jax.random.split(key, 3)
        episode = collect_fn(params, k_collect)
        states, actions = episode.states, episode.actions
        if states.ndim == 2:  # single env -> add batch axis for windowing
            states, actions = states[None], actions[None]
        episode_returns.append(float(jnp.mean(jnp.sum(episode.rewards, -1))))
        replay_buffer = replay_buffer.add_trajectories(
            normalizer.normalize_state(states),
            normalizer.normalize_action(actions),
        )
        # Sample from the buffer (device-side) and update.
        n_valid = int(replay_buffer.size)
        take = min(max(n_valid, 1), replay_buffer.capacity)
        dataset = (
            replay_buffer.states[:take],
            replay_buffer.actions[:take],
            replay_buffer.next_states[:take],
        )
        params, opt_state, ep_losses = _run_updates(
            dynamics_model,
            optimizer,
            params,
            opt_state,
            dataset,
            num_updates=num_updates,
            batch_size=batch_size,
            gamma=discount_factor,
            teacher_forcing_factor=teacher_forcing_factor * num_episodes,
            key=k_train,
            update_offset=num_updates * ep,
        )
        losses.extend(ep_losses)
    return params, opt_state, replay_buffer, episode_returns, losses
