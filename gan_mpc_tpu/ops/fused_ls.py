"""Fused line-search / rollout step for the batch-native iLQR solver.

The long-horizon (H=50) solver is latency-bound: each of its per-
timestep scan steps issues ~25 small XLA kernels (control law, dynamics
MLP, pseudo-Huber stage cost), and with 3 length-T scans per iteration
x 5 iterations the per-control-step time is dominated by per-kernel
overhead, not FLOPs (measured: bf16 MXU GEMMs moved the H=50 bench only
+7%). This module collapses ONE scan step into ONE Pallas program:

    u    = Uref + alpha * k + K (x - Xref)          (control law)
    nx   = x + MLP([x, u])                          (residual dynamics)
    cost = w_u sn(u) + w_x sn(x[:gs] - goal)
           + w_ag ag(u - gain * goal_u)             (stage cost)

batched over (B lanes, A line-search candidates). All activations stay
in VMEM; HBM traffic is the step's inputs/outputs only. The same kernel
serves the line search (alpha = per-(lane, candidate) grid), the
winner recompute (A=1, per-lane alpha), and the plain rollout
(alpha=0, K=0).

Semantics mirror ``policies/mpc.plan_batch``'s callbacks exactly
(``models/cost.stage_cost_batch`` + ``models/dynamics.batch_apply``);
numerics pinned by tests/test_fused_ls.py against those callbacks, and
the Pallas kernel against the jnp fallback in interpret mode.

Reference provenance: the per-step math is the reference's cost/dynamics
contract (``/root/reference/mpc/costs.py``, ``dynamics/nn.py:14-38``);
the fusion is TPU-native design with no reference counterpart.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from gan_mpc_tpu.models.cost import _HUBER_ALPHA


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# Test hook: run the Pallas kernel in interpreter mode (covers the
# kernel code path — grid, block specs, in-kernel math — off-TPU).
_INTERPRET = False


def _control_mlp_cost(
    x3, Xref, Uref, alphaBA, k, K_rows, goal, goal_u, wvec, Ws, bs,
    *, gs, action_goal_squared, ag_scale, bf16,
):
    """The fused step math on jnp arrays (works inside the Pallas kernel
    AND as the plain-XLA fallback).

    x3 (B, A, n); Xref (B, n); Uref/k (B, m); alphaBA (B, A);
    K_rows: m-tuple of (B, n) feedback-gain rows (pre-sliced — Mosaic
    supports only 2D gathers, so the kernel reads per-row 2D slices from
    the ref instead of indexing a loaded 3D array);
    goal (B, gs); goal_u (B, m); wvec (1, 4) = [w_u, w_x, w_ag, gain];
    Ws/bs: MLP layers with W0 pre-split into (W0x (n, h), W0u (m, h)).
    Returns nx (B, A, n), u (B, A, m), cost (B, A).
    """
    B, A, n = x3.shape
    m = Uref.shape[-1]
    f32 = jnp.float32
    cd = jnp.bfloat16 if bf16 else f32

    dx = x3 - Xref[:, None, :]  # (B, A, n)
    # batched control-law matvec as m unrolled VPU reductions (m is tiny)
    du = jnp.stack(
        [jnp.sum(Kj[:, None, :] * dx, axis=-1) for Kj in K_rows],
        axis=-1,
    )  # (B, A, m)
    u = Uref[:, None, :] + alphaBA[..., None] * k[:, None, :] + du

    # residual MLP; W0 is pre-split so x and u never concatenate on the
    # minor (lane) axis — two MXU dots replace the relayout.
    x2 = x3.reshape(B * A, n)
    u2 = u.reshape(B * A, m)
    (w0x, w0u), b0 = Ws[0], bs[0]
    h = (
        jnp.dot(x2.astype(cd), w0x.astype(cd), preferred_element_type=f32)
        + jnp.dot(u2.astype(cd), w0u.astype(cd), preferred_element_type=f32)
        + b0
    )
    h = jnp.maximum(h, 0.0)
    for i in range(1, len(Ws) - 1):
        h = (
            jnp.dot(h.astype(cd), Ws[i].astype(cd),
                    preferred_element_type=f32)
            + bs[i]
        )
        h = jnp.maximum(h, 0.0)
    dxm = (
        jnp.dot(h.astype(cd), Ws[-1].astype(cd),
                preferred_element_type=f32)
        + bs[-1]
    )
    nx = x3 + dxm.reshape(B, A, n)

    # pseudo-Huber stage cost (matches models/cost.stage_cost_batch)
    a = _HUBER_ALPHA
    sn = lambda v: jnp.sqrt(jnp.sum(v * v, axis=-1) + a * a) - a
    d = x3[..., :gs] - goal[:, None, :]
    cost = wvec[0, 0] * sn(u) + wvec[0, 1] * sn(d)
    dug = u - wvec[0, 3] * goal_u[:, None, :]
    if action_goal_squared:
        ag = ag_scale * jnp.sum(dug * dug, axis=-1)
    else:
        ag = ag_scale * sn(dug)
    cost = cost + wvec[0, 2] * ag
    return nx, u, cost


def _kernel(
    x_ref, xref_ref, uref_ref, alpha_ref, k_ref, K_ref, goal_ref,
    goalu_ref, w_ref, *wb_refs_and_outs,
    m, n_layers, gs, action_goal_squared, ag_scale, bf16,
):
    wb = wb_refs_and_outs[: 2 * n_layers + 1]
    nx_ref, u_ref, cost_ref = wb_refs_and_outs[2 * n_layers + 1:]
    # wb layout: W0x, W0u, b0, W1, b1, ..., W_{L-1}, b_{L-1}
    Ws = [(wb[0][:], wb[1][:])] + [
        wb[2 * i + 1][:] for i in range(1, n_layers)
    ]
    bs = [wb[2][:]] + [wb[2 * i + 2][:] for i in range(1, n_layers)]
    # per-row 2D reads of the feedback gains (3D gathers unsupported)
    K_rows = tuple(K_ref[:, j, :] for j in range(m))
    nx, u, cost = _control_mlp_cost(
        x_ref[:], xref_ref[:], uref_ref[:], alpha_ref[:], k_ref[:],
        K_rows, goal_ref[:], goalu_ref[:], w_ref[:], Ws, bs,
        gs=gs, action_goal_squared=action_goal_squared,
        ag_scale=ag_scale, bf16=bf16,
    )
    nx_ref[:] = nx
    u_ref[:] = u
    cost_ref[:] = cost


# Rows per grid step (B*A) before tiling the lane axis; VMEM budget is
# activations (rows x widest hidden x 2) + states — 128 lanes x 16
# candidates fits comfortably.
_B_TILE = 128


def fused_ls_step(
    x3: jax.Array,
    Xref: jax.Array,
    Uref: jax.Array,
    alphaBA: jax.Array,
    k: jax.Array,
    K: jax.Array,
    goal: jax.Array,
    goal_u: jax.Array,
    wvec: jax.Array,
    layers: Tuple[Tuple[jax.Array, jax.Array], ...],
    *,
    gs: int,
    action_goal_squared: bool,
    ag_scale: float,
    bf16: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One fused LS/rollout step. Shapes as in ``_control_mlp_cost``;
    ``layers`` = ((W, b), ...) with W0 (n+m, h1) UNsplit (split here).
    Routes to the Pallas kernel on TPU (B divisible by the lane tile),
    else runs the identical jnp math.
    """
    B, A, n = x3.shape
    m = Uref.shape[-1]
    w0, b0 = layers[0]
    Ws = [(w0[:n], w0[n:])] + [w for w, _ in layers[1:]]
    bs = [b0] + [b for _, b in layers[1:]]

    if not ((_on_tpu() or _INTERPRET) and B % _B_TILE == 0):
        K_rows = tuple(K[:, j, :] for j in range(m))
        return _control_mlp_cost(
            x3, Xref, Uref, alphaBA, k, K_rows, goal, goal_u, wvec, Ws,
            bs, gs=gs, action_goal_squared=action_goal_squared,
            ag_scale=ag_scale, bf16=bf16,
        )
    return _pallas_ls_step(
        x3, Xref, Uref, alphaBA, k, K, goal, goal_u, wvec, Ws, bs,
        gs=gs, action_goal_squared=action_goal_squared,
        ag_scale=ag_scale, bf16=bf16,
    )


def _pallas_ls_step(
    x3, Xref, Uref, alphaBA, k, K, goal, goal_u, wvec, Ws, bs,
    *, gs, action_goal_squared, ag_scale, bf16,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, A, n = x3.shape
    m = Uref.shape[-1]
    n_layers = len(Ws)
    grid = (B // _B_TILE,)

    wb_flat = [Ws[0][0], Ws[0][1], bs[0]]
    for i in range(1, n_layers):
        wb_flat += [Ws[i], bs[i]]

    def row_spec(*shape):
        nd = len(shape)
        return pl.BlockSpec(
            (_B_TILE,) + shape[1:],
            lambda i, nd=nd: (i,) + (0,) * (nd - 1),
            memory_space=pltpu.VMEM,
        )

    def const_spec(a):
        nd = a.ndim
        return pl.BlockSpec(
            a.shape, lambda i, nd=nd: (0,) * nd, memory_space=pltpu.VMEM
        )

    in_specs = [
        row_spec(B, A, n),      # x3
        row_spec(B, n),         # Xref
        row_spec(B, m),         # Uref
        row_spec(B, A),         # alphaBA
        row_spec(B, m),         # k
        row_spec(B, m, n),      # K
        row_spec(B, gs),        # goal
        row_spec(B, m),         # goal_u
        const_spec(wvec),       # wvec
    ] + [const_spec(a) for a in wb_flat]
    out_shape = [
        jax.ShapeDtypeStruct((B, A, n), jnp.float32),
        jax.ShapeDtypeStruct((B, A, m), jnp.float32),
        jax.ShapeDtypeStruct((B, A), jnp.float32),
    ]
    out_specs = [row_spec(B, A, n), row_spec(B, A, m), row_spec(B, A)]

    kernel = functools.partial(
        _kernel,
        m=m,
        n_layers=n_layers,
        gs=gs,
        action_goal_squared=action_goal_squared,
        ag_scale=ag_scale,
        bf16=bf16,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(x3, Xref, Uref, alphaBA, k, K, goal, goal_u, wvec, *wb_flat)
