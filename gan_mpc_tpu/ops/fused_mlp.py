"""Fused multi-layer MLP forward/backward as Pallas TPU kernels.

Why: the planner's hot loop evaluates small MLPs (dynamics 4->200->200->
200->3, cost 3->128->128->10) thousands of times per control step over
large env batches. XLA lowers each Dense layer to a separate dot +
elementwise op, spilling every intermediate activation (B, hidden) to HBM
— at large batch the planner becomes HBM-bandwidth-bound (measured:
throughput saturates ~163k steps/s at B>=1024 on v5e). Fusing the whole
stack into ONE kernel keeps all activations in VMEM: HBM traffic drops to
inputs + outputs + (tiny) weights.

Design:
  * batched 2D input (B, fin); grid over row tiles of 256; every layer's
    weights live in VMEM for the whole kernel (hidden <= 512 assumed —
    far under the ~16MB VMEM budget for these model sizes);
  * relu on all but the last layer (the model zoo's convention);
  * backward pass is a second fused kernel computing dx and (dW, db) per
    row-tile with accumulation over the grid — wired up via
    ``jax.custom_vjp`` so ``jax.grad`` through the planner still works;
  * off-TPU (CPU tests) the same math runs as plain jnp (fallback), so
    numerics are testable everywhere and kernels verified against the
    fallback on real TPU.

SURVEY.md §7 step 8 / BASELINE.json north-star: "cost/, dynamics/, and
critic/ MLP forward/backward passes fuse into Pallas kernels".

Measured (v5e, dynamics stack 4->200->200->200->3, f32): single apply at
B=131072: 1.29 ms fused vs 1.78 ms XLA (1.38x). The win grows with batch;
below ~B=32k XLA's pipelining across chained applies is competitive, so
the planner integration (batch-native planner calling this op on the
whole env batch) is the follow-up that cashes this in.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

_TILE = 1024


def mlp_params(
    key: jax.Array, sizes: Sequence[int], dtype=jnp.float32
) -> Tuple[Tuple[jax.Array, jax.Array], ...]:
    """He-initialized (W, b) list for layer sizes [fin, h1, ..., fout]."""
    params = []
    for fin, fout in zip(sizes[:-1], sizes[1:]):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (fin, fout), dtype) * jnp.sqrt(2.0 / fin)
        params.append((w, jnp.zeros((fout,), dtype)))
    return tuple(params)


def _mm(a, w, dtype):
    """GEMM at the requested MXU dtype with f32 accumulation.

    dtype=None keeps plain f32. dtype=bfloat16 casts BOTH operands so the
    MXU runs at its native bf16 rate; ``preferred_element_type`` keeps the
    accumulator (and output) f32, so downstream elementwise math and the
    Riccati recursion never see bf16 rounding beyond the product terms.
    """
    if dtype is None:
        return a @ w
    return jnp.dot(
        a.astype(dtype), w.astype(dtype),
        preferred_element_type=jnp.float32,
    )


def _reference_forward(x, params, dtype=None):
    h = x
    for i, (w, b) in enumerate(params):
        h = _mm(h, w, dtype) + b
        if i < len(params) - 1:
            h = jax.nn.relu(h)
    return h


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(n_layers, x_ref, *refs):
    """refs: W0, b0, W1, b1, ..., out_ref, then per-layer activation
    scratch? — activations are small; recompute in bwd instead."""
    *wb_refs, out_ref = refs
    h = x_ref[:]
    for i in range(n_layers):
        w = wb_refs[2 * i][:]
        b = wb_refs[2 * i + 1][:]
        h = (
            jnp.dot(h, w, preferred_element_type=jnp.float32)
            + b[None, :]
        )
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
    out_ref[:] = h


def _bwd_kernel(n_layers, x_ref, g_ref, *refs):
    """Recompute activations in VMEM, then backprop within the tile.
    Outputs: dx tile + per-layer (dW, db) partials accumulated over grid."""
    from jax.experimental import pallas as pl

    wb_refs = refs[: 2 * n_layers]
    dx_ref = refs[2 * n_layers]
    grad_refs = refs[2 * n_layers + 1 :]

    # forward recompute, stashing pre-relu activations
    h = x_ref[:]
    acts = [h]
    for i in range(n_layers):
        w = wb_refs[2 * i][:]
        b = wb_refs[2 * i + 1][:]
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b[None, :]
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
        acts.append(h)

    first_tile = pl.program_id(0) == 0
    g = g_ref[:]
    for i in reversed(range(n_layers)):
        w = wb_refs[2 * i][:]
        a_in = acts[i]
        dw = jnp.dot(
            a_in.T, g, preferred_element_type=jnp.float32
        )
        db = jnp.sum(g, axis=0)
        dw_ref, db_ref = grad_refs[2 * i], grad_refs[2 * i + 1]

        @pl.when(first_tile)
        def _(dw_ref=dw_ref, db_ref=db_ref, dw=dw, db=db):
            dw_ref[:] = dw
            db_ref[:] = db

        @pl.when(jnp.logical_not(first_tile))
        def _(dw_ref=dw_ref, db_ref=db_ref, dw=dw, db=db):
            dw_ref[:] = dw_ref[:] + dw
            db_ref[:] = db_ref[:] + db

        g = jnp.dot(g, w.T, preferred_element_type=jnp.float32)
        if i > 0:
            g = jnp.where(acts[i] > 0.0, g, 0.0)
    dx_ref[:] = g


def _pad_rows(a, batch_padded):
    pad = batch_padded - a.shape[0]
    if pad == 0:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
    )


def _pallas_forward(x, params):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers = len(params)
    batch, fin = x.shape
    fout = params[-1][0].shape[1]
    batch_padded = max(_TILE, -(-batch // _TILE) * _TILE)
    x = _pad_rows(x, batch_padded)
    grid = (batch_padded // _TILE,)

    wb_flat = []
    for w, b in params:
        wb_flat += [w, b]

    in_specs = [
        pl.BlockSpec(
            (_TILE, fin), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    ] + [
        pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for a in wb_flat
    ]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (_TILE, fout), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch_padded, fout), jnp.float32),
    )(x, *wb_flat)
    return out[:batch]


def _pallas_backward(x, params, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers = len(params)
    batch, fin = x.shape
    fout = g.shape[1]
    batch_padded = max(_TILE, -(-batch // _TILE) * _TILE)
    # zero-padded rows contribute nothing to dW/db and their dx is sliced
    x = _pad_rows(x, batch_padded)
    g = _pad_rows(g, batch_padded)
    grid = (batch_padded // _TILE,)

    wb_flat = []
    for w, b in params:
        wb_flat += [w, b]

    in_specs = [
        pl.BlockSpec((_TILE, fin), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_TILE, fout), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for a in wb_flat
    ]
    out_shape = [jax.ShapeDtypeStruct((batch_padded, fin), jnp.float32)] + [
        jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in wb_flat
    ]
    out_specs = [
        pl.BlockSpec((_TILE, fin), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for a in wb_flat
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(x, g, *wb_flat)
    dx, *dwb = outs
    grads = tuple(
        (dwb[2 * i], dwb[2 * i + 1]) for i in range(n_layers)
    )
    return dx[:batch], grads


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@jax.custom_vjp
def fused_mlp(x: jax.Array, params) -> jax.Array:
    """relu-MLP forward: x (B, fin) -> (B, fout); params = ((W, b), ...).

    One fused Pallas kernel on TPU; identical jnp math elsewhere.
    """
    if _on_tpu():
        return _pallas_forward(x, params)
    return _reference_forward(x, params)


def _fused_fwd(x, params):
    return fused_mlp(x, params), (x, params)


def _fused_bwd(res, g):
    x, params = res
    if _on_tpu():
        dx, grads = _pallas_backward(x, params, g)
        return dx, grads

    # fallback: plain autodiff of the reference math
    _, vjp = jax.vjp(_reference_forward, x, params)
    return vjp(g)


fused_mlp.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# fused value + Jacobian (batch-native planner linearization)
# ---------------------------------------------------------------------------

def dense_stack(flax_params) -> Tuple[Tuple[jax.Array, jax.Array], ...]:
    """((W, b), ...) from a flax param tree of auto-named Dense layers."""
    layers = flax_params["params"]
    names = sorted(layers, key=lambda s: int(s.rsplit("_", 1)[1]))
    return tuple((layers[k]["kernel"], layers[k]["bias"]) for k in names)


# Minimum rows before the Pallas forward beats XLA's pipelined Denses
# (measured on v5e: crossover ~32k, competitive from ~8k; see module
# docstring). Below this plain jnp is used. The crossover was measured
# on STANDALONE applies; inside a lax.scan step the fused kernel also
# collapses ~11 HLO ops into one launch, which matters in the
# latency-bound long-horizon solver — hence the env override
# (GMT_FUSED_MIN_ROWS) for bench exploration.
import os as _os

FUSED_MIN_ROWS = int(_os.environ.get("GMT_FUSED_MIN_ROWS", "8192"))


def mlp_apply(x: jax.Array, params, dtype=None) -> jax.Array:
    """relu-MLP forward on (N, fin) rows; routes to the fused Pallas
    kernel when the batch is large enough for it to win. ``dtype``
    selects the GEMM compute dtype (see ``_mm``); the bf16 path uses the
    plain-XLA form (the dots run at MXU bf16 rate and XLA fuses the
    elementwise tail)."""
    if dtype is None and _on_tpu() and x.shape[0] >= FUSED_MIN_ROWS:
        return fused_mlp(x, params)
    return _reference_forward(x, params, dtype)


def mlp_value_and_jac(x: jax.Array, params, dtype=None):
    """Forward value AND exact input-Jacobian of a relu MLP, batch-major.

    x: (N, fin) -> (y (N, fout), J (N, fout, fin)).

    The planner's linearization previously pushed fin tangent vectors per
    instance through ``jax.jacfwd`` (per-instance batched matmuls). Here
    the Jacobian chain is computed as flattened GEMMs with the shared
    weight — MXU-shaped (M huge, K/N = layer widths) — with the relu
    masks from the forward pass applied between layers. Exact for relu
    networks (piecewise-linear, so the product of masked weight matrices
    IS the Jacobian a.e.).

    The chain runs from whichever side is cheaper: input-side when
    fin <= fout (tangent blocks (N*fin, h)), output-side when fout < fin
    (cotangent blocks (N*fout, h) — e.g. the planner's dynamics
    linearization has fin = n+m > fout = n, so the output-side chain
    saves a factor fin/fout on every GEMM).

    ``dtype`` selects the GEMM compute dtype (``_mm``): bfloat16 runs the
    whole chain at MXU bf16 rate with f32 accumulation; masks and the
    forward bias/relu tail stay f32.
    """
    n_layers = len(params)
    N, fin = x.shape
    h = x
    masks = []
    for i, (w, b) in enumerate(params):
        h = _mm(h, w, dtype) + b
        if i < n_layers - 1:
            mask = (h > 0.0).astype(h.dtype)
            h = h * mask
            masks.append(mask)
    fout = params[-1][0].shape[1]

    if fout < fin:
        # output-side (cotangent) chain:
        #   R_L = W_{L-1};  R_i = W_i diag(m_{i+1}) R_{i+1}
        # accumulated as flattened (N*fout, h) GEMMs on the transposed
        # blocks; J_rowvec = R_0 has shape (fin, fout).
        wl = params[-1][0]  # (h_{L-1}, fout)
        R = jnp.broadcast_to(wl[None], (N,) + wl.shape)
        if masks:
            R = R * masks[-1][..., None]
        for i in range(n_layers - 2, -1, -1):
            wi = params[i][0]  # (h_i, h_{i+1}); R (N, h_{i+1}, fout)
            Rt = jnp.swapaxes(R, 1, 2).reshape(N * fout, -1)
            R = _mm(Rt, wi.T, dtype).reshape(N, fout, -1)
            R = jnp.swapaxes(R, 1, 2)  # (N, h_i, fout)
            if i > 0:
                R = R * masks[i - 1][..., None]
        return h, jnp.swapaxes(R, 1, 2)  # (N, fout, fin)

    w0 = params[0][0]  # (fin, h1)
    J = jnp.broadcast_to(w0[None], (N,) + w0.shape)
    if masks:
        J = J * masks[0][:, None, :]
    for i in range(1, n_layers):
        wi = params[i][0]  # (h_i, h_{i+1})
        J = _mm(J.reshape(N * fin, -1), wi, dtype).reshape(N, fin, -1)
        if i < n_layers - 1:
            J = J * masks[i][:, None, :]
    return h, jnp.swapaxes(J, 1, 2)  # (N, fout, fin)
