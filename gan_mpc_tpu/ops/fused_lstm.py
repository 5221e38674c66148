"""Fused LSTM sequence scan as a Pallas TPU kernel.

SURVEY.md §5 (long-context row): "keep LSTM scan but fuse cell into a
Pallas kernel". A lax.scan of an LSTM cell issues, per time step, several
small HLO ops whose intermediates round-trip HBM and whose dispatch
latency dominates at small widths. This kernel runs the WHOLE sequence
inside one Pallas program: weights stay in VMEM for all T steps, the
(c, h) state lives in registers/VMEM, and only the input sequence and
the per-step hidden outputs touch HBM once each.

Layout: batched inputs x (B, T, IN); weights Wx (IN, 4H), Wh (H, 4H),
bias (4H,) with gate order (i, f, g, o) — the standard fused-gate layout.
Backward via ``jax.custom_vjp`` whose residual recompute uses the
reference jnp implementation (gradient correctness by construction; the
forward is the hot inference/scoring path). Off-TPU the reference math
runs directly.

Measured (v5e, f32): bit-exact vs the reference at all tested shapes; at
(B=8192, T=25, IN=64, H=256) the kernel is ~0.9x of XLA's lax.scan
(4.6 vs 4.2 ms) — XLA already keeps these batched scan matmuls efficient
on this chip, so the kernel is currently a correctness-verified building
block rather than a speedup; revisit with bf16 gates and per-tile double
buffering if a model family makes LSTM scoring hot.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_TILE_B = 256


def lstm_params(key: jax.Array, in_size: int, hidden: int):
    k1, k2 = jax.random.split(key)
    scale_x = 1.0 / jnp.sqrt(in_size)
    scale_h = 1.0 / jnp.sqrt(hidden)
    return {
        "wx": scale_x * jax.random.normal(k1, (in_size, 4 * hidden)),
        "wh": scale_h * jax.random.normal(k2, (hidden, 4 * hidden)),
        "b": jnp.zeros((4 * hidden,)),
    }


def _cell(x_t, c, h, wx, wh, b, hidden):
    gates = x_t @ wx + h @ wh + b
    i = jax.nn.sigmoid(gates[..., :hidden])
    f = jax.nn.sigmoid(gates[..., hidden : 2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[..., 3 * hidden :])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return c, h


def _reference_lstm(x, params) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """x (B, T, IN) -> (hs (B, T, H), c_T (B, H), h_T (B, H))."""
    hidden = params["wh"].shape[0]
    B = x.shape[0]
    c0 = jnp.zeros((B, hidden), x.dtype)
    h0 = jnp.zeros((B, hidden), x.dtype)

    def step(carry, x_t):
        c, h = carry
        c, h = _cell(x_t, c, h, params["wx"], params["wh"], params["b"], hidden)
        return (c, h), h

    (c, h), hs = jax.lax.scan(step, (c0, h0), jnp.swapaxes(x, 0, 1))
    return jnp.swapaxes(hs, 0, 1), c, h


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _lstm_kernel(T, hidden, x_ref, wx_ref, wh_ref, b_ref, hs_ref, c_ref, h_ref):
    from jax.experimental import pallas as pl

    wx, wh, b = wx_ref[:], wh_ref[:], b_ref[:]
    tile_b = x_ref.shape[1]

    def body(t, carry):
        c, h = carry
        x_t = x_ref[pl.ds(t, 1), :, :][0]
        gates = (
            jnp.dot(x_t, wx, preferred_element_type=jnp.float32)
            + jnp.dot(h, wh, preferred_element_type=jnp.float32)
            + b[None, :]
        )
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden :])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        hs_ref[pl.ds(t, 1), :, :] = h[None, :, :]
        return (c, h)

    c0 = jnp.zeros((tile_b, hidden), jnp.float32)
    h0 = jnp.zeros((tile_b, hidden), jnp.float32)
    c, h = jax.lax.fori_loop(0, T, body, (c0, h0))
    c_ref[:] = c
    h_ref[:] = h


def _pallas_lstm(x, params):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, in_size = x.shape
    hidden = params["wh"].shape[0]
    # Size the batch tile to the VMEM budget: the x block (T, tile, in) and
    # hs block (T, tile, hidden) are both double-buffered.
    budget = 10 * 2**20
    per_row = T * (in_size + hidden) * 4 * 2
    tile = max(8, min(_TILE_B, (budget // per_row) // 8 * 8))
    bp = max(tile, -(-B // tile) * tile)
    if bp != B:
        x = jnp.concatenate(
            [x, jnp.zeros((bp - B, T, in_size), x.dtype)], axis=0
        )
    grid = (bp // tile,)
    # time-major in/out inside the kernel: leading-dim dynamic slices are
    # the well-supported pattern on TPU
    xt = jnp.swapaxes(x, 0, 1)  # (T, bp, in)
    out_shape = [
        jax.ShapeDtypeStruct((T, bp, hidden), jnp.float32),
        jax.ShapeDtypeStruct((bp, hidden), jnp.float32),
        jax.ShapeDtypeStruct((bp, hidden), jnp.float32),
    ]
    hs, c, h = pl.pallas_call(
        functools.partial(_lstm_kernel, T, hidden),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (T, tile, in_size), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                params["wx"].shape, lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                params["wh"].shape, lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                params["b"].shape, lambda i: (0,), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (T, tile, hidden), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, hidden), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, hidden), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=out_shape,
    )(xt, params["wx"], params["wh"], params["b"])
    return jnp.swapaxes(hs, 0, 1)[:B], c[:B], h[:B]


@jax.custom_vjp
def fused_lstm(x: jax.Array, params) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """LSTM over x (B, T, IN) from zero state -> (hs, c_T, h_T)."""
    if _on_tpu():
        return _pallas_lstm(x, params)
    return _reference_lstm(x, params)


def _fwd(x, params):
    return fused_lstm(x, params), (x, params)


def _bwd(res, cot):
    x, params = res
    _, vjp = jax.vjp(_reference_lstm, x, params)
    return vjp(cot)


fused_lstm.defvjp(_fwd, _bwd)
