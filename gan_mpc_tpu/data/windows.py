"""Vectorized sliding-window dataset construction.

Capability parity with the reference's per-element Python loops
(``/root/reference/data_loader.py:70-129``), rewritten as one gather per
trajectory set (index arithmetic, no host loops) so the datasets can be
built on device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _window_indices(num_windows: int, width: int) -> jax.Array:
    return jnp.arange(num_windows)[:, None] + jnp.arange(width)[None, :]


def cost_windows(
    states: jax.Array, history: int, horizon: int
) -> Tuple[jax.Array, jax.Array]:
    """Cost-training windows from (N, L, x) state trajectories.

    Returns ``(X, Y)``: X = (num, history + 1, x) past windows (trajectories
    are zero-padded at the front by `history`, as the reference does at
    ``data_loader.py:78-84``), Y = (num, horizon + 1, x) future windows.
    """
    n, length, x_size = states.shape
    padded = jnp.concatenate(
        [jnp.zeros((n, history, x_size), states.dtype), states], axis=1
    )
    num = length - horizon - history
    starts = jnp.arange(num) + history  # position of "now" in padded frame
    x_idx = starts[:, None] + jnp.arange(history + 1)[None, :] - history
    y_idx = starts[:, None] + jnp.arange(horizon + 1)[None, :]
    X = padded[:, x_idx]  # (N, num, history+1, x): past incl. now
    Y = padded[:, y_idx]  # (N, num, horizon+1, x): now and future
    return (
        X.reshape(n * num, history + 1, x_size),
        Y.reshape(n * num, horizon + 1, x_size),
    )


def sequence_windows(
    states: jax.Array,
    actions: jax.Array,
    seqlen: int,
    start_oversample: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(xseq, useq, next_xseq) windows from (N, L, ·) trajectories —
    the dynamics/expert dataset schema (``data_loader.py:102-129``).

    ``start_oversample > 0`` repeats each trajectory's first
    ``seqlen`` windows that many extra times. Episodes begin at REST
    (reset states, zero velocity) and the behavior there — e.g. the
    pendulum expert initiating energy pumping from hanging rest — is
    otherwise covered by ~seqlen of ~length windows (<1%), leaving the
    expert predictor out-of-distribution exactly where closed-loop
    rollouts start. (Measured on pendulum: rest-start returns 0 without
    it; the true-dynamics planner probe isolated goal generation as the
    cause.)"""
    n, length, x_size = states.shape
    u_size = actions.shape[-1]
    num = length - seqlen
    idx = _window_indices(num, seqlen)
    if start_oversample > 0:
        early = idx[: min(seqlen, num)]
        idx = jnp.concatenate(
            [idx] + [early] * start_oversample, axis=0
        )
        num = idx.shape[0]
    X = states[:, idx].reshape(n * num, seqlen, x_size)
    U = actions[:, idx].reshape(n * num, seqlen, u_size)
    Y = states[:, idx + 1].reshape(n * num, seqlen, x_size)
    return X, U, Y


def split_sequence_windows(
    states: jax.Array,
    actions: jax.Array,
    seqlen: int,
    key: jax.Array,
    start_oversample: int = 0,
    train_frac: float = 0.8,
):
    """Train/test split of sequence windows with rest-start oversampling
    applied ONLY to the train split.

    Splitting must happen before oversampling: duplicating windows first
    puts identical copies on both sides of the split, contaminating the
    held-out loss (and any model selection based on it). Here the base
    windows are shuffle-split at the index level, and the train side then
    gains ``start_oversample`` extra copies of its own early (episode
    start) windows — the test split stays disjoint from everything
    trained on. Returns ``(train, test)`` tuples of (xseq, useq,
    next_xseq)."""
    n, length, x_size = states.shape
    u_size = actions.shape[-1]
    num = length - seqlen
    idx = _window_indices(num, seqlen)  # (num, seqlen), per-trajectory

    flat = jnp.arange(n * num)
    perm = jax.random.permutation(key, n * num)
    cut = int(n * num * train_frac)
    train_ids, test_ids = perm[:cut], perm[cut:]
    if start_oversample > 0:
        # early window = one of the first `seqlen` windows of its
        # trajectory (window start position < seqlen)
        starts = flat % num
        early_train = train_ids[starts[train_ids] < min(seqlen, num)]
        train_ids = jnp.concatenate(
            [train_ids] + [early_train] * start_oversample
        )

    def gather(ids):
        traj, w = ids // num, ids % num
        widx = idx[w]  # (k, seqlen)
        X = states[traj[:, None], widx]
        U = actions[traj[:, None], widx]
        Y = states[traj[:, None], widx + 1]
        return (
            X.reshape(-1, seqlen, x_size),
            U.reshape(-1, seqlen, u_size),
            Y.reshape(-1, seqlen, x_size),
        )

    return gather(train_ids), gather(test_ids)


def shuffle_and_split(dataset: tuple, key: jax.Array, train_frac: float = 0.8):
    """Random shuffle + train/test split (``data_loader.py:60-68``)."""
    size = dataset[0].shape[0]
    perm = jax.random.permutation(key, size)
    cut = int(size * train_frac)
    train = tuple(d[perm[:cut]] for d in dataset)
    test = tuple(d[perm[cut:]] for d in dataset)
    return train, test


def minibatch_indices(
    key: jax.Array, datasize: int, steps: int, batch_size: int
) -> jax.Array:
    """(steps, batch) random index matrix — one scanned epoch's minibatches
    (sampling with replacement, as the reference's ``jax.random.choice``
    at e.g. ``norm/cost_trainer.py:70-73``)."""
    return jax.random.choice(key, datasize, shape=(steps, batch_size))
