"""Learned cost model.

Capability parity with the reference cost stack
(``/root/reference/cost/nn.py`` + ``/root/reference/cost/cost_model.py``):

  * a feature MLP whose squared feature norm is the (always >= 0) learned
    terminal cost;
  * a running cost that is a sigmoid-weighted combination of smoothed-L1
    ("pseudo-Huber", alpha = 1e-2) action magnitude and distance to a
    per-timestep goal state;
  * the terminal step (``t == horizon``) selects the NN cost scaled by the
    (sigmoid-squashed) terminal weight.

The trainable pieces are the MLP parameters and the three raw MPC weights
(action, state, terminal) — both flow gradients through the planner via the
implicit bilevel VJP.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_HUBER_ALPHA = 1e-2


def smoothed_norm(v: jax.Array, alpha: float = _HUBER_ALPHA) -> jax.Array:
    """Pseudo-Huber magnitude: sqrt(|v|^2 + a^2) - a (smooth at 0)."""
    return jnp.sqrt(jnp.vdot(v, v) + alpha * alpha) - alpha


class CostFeatureNet(nn.Module):
    """MLP mapping the planner state to a feature vector f; cost = <f, f>."""

    hidden: Sequence[int] = (128, 128)
    features_out: int = 10

    @nn.compact
    def __call__(self, xc: jax.Array) -> jax.Array:
        h = xc
        for width in self.hidden:
            h = nn.relu(nn.Dense(width)(h))
        f = nn.Dense(self.features_out)(h)
        return jnp.vdot(f, f)


class MPCCost:
    """Stateless planner-cost assembler around a CostFeatureNet.

    ``params`` convention: ``{"net": <flax params>, "weights": (3,) raw}``
    where ``weights`` are pre-sigmoid (action, state, terminal).
    """

    def __init__(self, net: CostFeatureNet, horizon: int):
        self.net = net
        self.horizon = horizon

    def init(self, key: jax.Array, xc_size: int) -> dict:
        net_params = self.net.init(key, jnp.zeros((xc_size,)))
        return net_params

    def stage(
        self,
        xc: jax.Array,
        u: jax.Array,
        t: jax.Array,
        raw_weights: jax.Array,
        goal_X: jax.Array,
    ) -> jax.Array:
        """Running cost for t < horizon (no neural net involved)."""
        w = jax.nn.sigmoid(raw_weights)
        x_size = goal_X.shape[-1]
        goal = goal_X[t]
        return w[0] * smoothed_norm(u) + w[1] * smoothed_norm(
            xc[:x_size] - goal
        )

    def terminal(
        self, xc: jax.Array, net_params, raw_weights: jax.Array
    ) -> jax.Array:
        """Terminal cost: sigmoid(w_term) * <f(x), f(x)>."""
        w = jax.nn.sigmoid(raw_weights)
        return w[2] * self.net.apply(net_params, xc)

    def __call__(
        self,
        xc: jax.Array,
        u: jax.Array,
        t: jax.Array,
        net_params,
        raw_weights: jax.Array,
        goal_X: jax.Array,
    ) -> jax.Array:
        """Combined planner cost (t == horizon selects the terminal) —
        kept for the trajax-style single-function interface; the policy
        uses the split stage/terminal form for speed."""
        return jnp.where(
            t == self.horizon,
            self.terminal(xc, net_params, raw_weights),
            self.stage(xc, u, t, raw_weights, goal_X),
        )
