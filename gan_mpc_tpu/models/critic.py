"""Adversarial sequence critic (discriminator).

Capability parity with ``/root/reference/critic/nn.py``: an LSTM scans a
state sequence and an MLP head maps the final hidden output to a scalar
realness score. Operates on a single unbatched sequence; batch via vmap.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class SequenceCritic(nn.Module):
    """LSTM over (seq_len, x_size) -> scalar score."""

    features: int = 64
    hidden: Sequence[int] = (64,)

    @nn.compact
    def __call__(self, xseq: jax.Array) -> jax.Array:
        cell = nn.scan(
            nn.OptimizedLSTMCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(features=self.features)
        zeros = jnp.zeros((self.features,), dtype=xseq.dtype)
        (_, _), outs = cell((zeros, zeros), xseq)
        h = outs[-1]
        for width in self.hidden:
            h = nn.relu(nn.Dense(width)(h))
        return nn.Dense(1)(h)[0]

    def init_params(self, key: jax.Array, x_size: int):
        return self.init(key, jnp.zeros((1, x_size)))
