"""Expert prediction model: an autoregressive state-action sequence model.

Capability parity with ``/root/reference/expert/nn.py`` +
``/root/reference/expert/expert_model.py``:

  * per-step cell emits (next_x, u): ``next_x`` is residual on the input
    state, ``u`` is tanh-squashed;
  * the teacher-forcing switch lives INSIDE the cell (``jnp.where(tf, x,
    x_prev)``) so open/closed-loop unrolls are the same compiled program;
  * MLP and LSTM cell variants. Cell-inventory mapping to the reference:
    ``_MLPCell`` = ``StackedMLPCell`` (``expert/nn.py:22-40`` — shared
    relu trunk + two deep heads; that IS the reference's "mlp" arch,
    scanned by ``ScanMLP``), ``_PredictionHeads`` = its plain ``MLPCell``
    head submodule (``expert/nn.py:10-19``), ``_LSTMCell`` = ``LSTMCell``
    (``expert/nn.py:43-61``) — all three reference cells are covered;
  * plan-time services: warm a carry from the observed state history, then
    autoregressively generate the goal state sequence and warm-start action
    sequence for the MPC planner (``expert_model.py:60-91``).

Modules here operate on a single unbatched sequence (seq_len, x_size);
batching is ``jax.vmap`` at the call site — idiomatic JAX, and it shards
cleanly under ``shard_map``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class _PredictionHeads(nn.Module):
    """Maps a trunk feature y (and input state x) to (next_x, u)."""

    x_size: int
    u_size: int
    hidden: Sequence[int]

    @nn.compact
    def __call__(self, y: jax.Array, x: jax.Array):
        hx = y
        for width in self.hidden:
            hx = nn.relu(nn.Dense(width)(hx))
        next_x = nn.Dense(self.x_size)(hx) + x
        hu = y
        for width in self.hidden:
            hu = nn.relu(nn.Dense(width)(hu))
        u = nn.tanh(nn.Dense(self.u_size)(hu))
        return next_x, u


class _MLPCell(nn.Module):
    x_size: int
    u_size: int
    hidden: Sequence[int]

    @nn.compact
    def __call__(self, carry, x_t, teacher_forcing):
        (x_prev,) = carry
        x = jnp.where(teacher_forcing, x_t, x_prev)
        y = nn.relu(nn.Dense(self.hidden[0])(x))
        next_x, u = _PredictionHeads(self.x_size, self.u_size, self.hidden)(
            y, x
        )
        return (next_x,), (next_x, u)


class _LSTMCell(nn.Module):
    x_size: int
    u_size: int
    features: int
    hidden: Sequence[int]

    @nn.compact
    def __call__(self, carry, x_t, teacher_forcing):
        lstm_state, x_prev = carry
        x = jnp.where(teacher_forcing, x_t, x_prev)
        lstm_state, y = nn.OptimizedLSTMCell(self.features)(lstm_state, x)
        next_x, u = _PredictionHeads(self.x_size, self.u_size, self.hidden)(
            y, x
        )
        return (lstm_state, next_x), (next_x, u)


class ExpertPredictor(nn.Module):
    """Scans the prediction cell over a state sequence.

    ``__call__(carry, xseq, teacher_forcing)`` with xseq (seq_len, x_size)
    returns ``(carry, (next_xseq, useq))``. ``teacher_forcing`` may be a
    traced boolean — open vs. closed loop does not recompile.
    """

    x_size: int
    u_size: int
    arch: str = "lstm"  # "mlp" | "lstm"
    features: int = 128
    hidden: Sequence[int] = (128, 128)

    def init_carry(self, x0: jax.Array):
        """Recurrent state for a fresh sequence starting at x0."""
        if self.arch == "lstm":
            zeros = jnp.zeros((self.features,), dtype=jnp.float32)
            return ((zeros, zeros), x0)
        return (x0,)

    def _cell(self):
        if self.arch == "lstm":
            return _LSTMCell(self.x_size, self.u_size, self.features, self.hidden)
        if self.arch == "mlp":
            return _MLPCell(self.x_size, self.u_size, self.hidden)
        raise ValueError(f"unknown expert arch {self.arch!r}")

    @nn.compact
    def __call__(self, carry, xseq: jax.Array, teacher_forcing):
        scan = nn.scan(
            lambda cell, c, x: cell(c, x, teacher_forcing),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        return scan(self._cell(), carry, xseq)

    # -- plan-time / train-time services --------------------------------

    def init_params(self, key: jax.Array):
        x0 = jnp.zeros((self.x_size,))
        return self.init(key, self.init_carry(x0), x0[None], True)

    def warm_carry(self, params, history_x: jax.Array):
        """Teacher-forced replay of the history -> carry poised at the
        current state. history_x: (h + 1, x_size); the last row is the
        current state, which becomes the autoregressive seed."""
        carry = self.init_carry(history_x[0])
        carry, _ = self.apply(params, carry, history_x[:-1], True)
        if self.arch == "lstm":
            lstm_state, _ = carry
            return (lstm_state, history_x[-1])
        return (history_x[-1],)

    def generate(self, params, carry, horizon: int):
        """Autoregressive rollout of the expert's predicted future.

        Returns ``(goal_xseq, useq)`` with shapes (horizon + 1, x_size) and
        (horizon, u_size); ``goal_xseq[0]`` is the current state held in
        the carry (matches the reference's goal/warm-start contract,
        ``/root/reference/policy/eval.py:88-107``).
        """
        x_now = carry[-1]
        placeholder = jnp.zeros((horizon, self.x_size), dtype=jnp.float32)
        _, (next_xseq, useq) = self.apply(params, carry, placeholder, False)
        goal_xseq = jnp.concatenate([x_now[None], next_xseq], axis=0)
        return goal_xseq, useq
