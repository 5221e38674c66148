"""Shared training utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def discounted_sum(seq: jax.Array, gamma) -> jax.Array:
    """sum_t gamma^t * seq[t] along axis 0 (vectorized; the reference used
    a fori_loop, ``/root/reference/utils.py:230-240``)."""
    t = jnp.arange(seq.shape[0], dtype=seq.dtype)
    discounts = jnp.power(jnp.asarray(gamma, seq.dtype), t)
    return jnp.tensordot(discounts, seq, axes=(0, 0))
