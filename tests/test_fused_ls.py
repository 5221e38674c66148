"""Fused line-search step (ops/fused_ls.py) numerics.

Pins three contracts:
  1. the fused step's math == the solver's unfused callbacks (control
     law + models/dynamics.batch_apply + models/cost.stage_cost_batch);
  2. batch_ilqr with settings.fused_ls="on" == "off" (same solve);
  3. the Pallas kernel (interpret mode) == the jnp fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np

import gan_mpc_tpu.ops.fused_ls as fl
from gan_mpc_tpu.models.cost import CostFeatureNet, MPCCost
from gan_mpc_tpu.models.dynamics import (
    LearnedDynamics,
    ResidualMLPDynamicsNet,
)
from gan_mpc_tpu.ops.fused_mlp import dense_stack

KEY = jax.random.PRNGKey(0)
B, A, N, M, GS = 8, 4, 5, 2, 5


def _setup(raw_dim=5, ag_squared=True, ag_scale=7.0):
    dyn = LearnedDynamics(ResidualMLPDynamicsNet(x_size=N, hidden=(16, 16)))
    dyn_params = dyn.init(KEY, M)
    cost = MPCCost(
        CostFeatureNet(hidden=(8,), features_out=3),
        horizon=6,
        action_goal_scale=ag_scale,
        action_goal_squared=ag_squared,
    )
    raw_w = jnp.linspace(-0.5, 0.8, raw_dim)
    ks = jax.random.split(jax.random.PRNGKey(1), 9)
    x3 = jax.random.normal(ks[0], (B, A, N))
    Xref = jax.random.normal(ks[1], (B, N))
    Uref = 0.3 * jax.random.normal(ks[2], (B, M))
    k = 0.2 * jax.random.normal(ks[3], (B, M))
    Kg = 0.2 * jax.random.normal(ks[4], (B, M, N))
    goal = jax.random.normal(ks[5], (B, GS))
    goal_u = 0.3 * jax.random.normal(ks[6], (B, M))
    alphaBA = jnp.abs(jax.random.normal(ks[7], (B, A)))
    return (dyn, dyn_params, cost, raw_w, x3, Xref, Uref, k, Kg, goal,
            goal_u, alphaBA)


def _reference_step(dyn, dyn_params, cost, raw_w, x3, Xref, Uref, k, Kg,
                    goal, goal_u, alphaBA):
    """The solver's unfused per-step math (batch_ilqr._line_search_objs
    body with per-(lane, candidate) alphas)."""
    du = jnp.einsum("bmn,ban->bam", Kg, x3 - Xref[:, None])
    u = Uref[:, None] + alphaBA[..., None] * k[:, None] + du
    goal_tm = jnp.broadcast_to(goal[None], (1, B, GS))
    goalu_tm = jnp.broadcast_to(goal_u[None], (1, B, M))
    c = cost.stage_cost_batch(x3, u, 0, raw_w, goal_tm, goalu_tm)
    nx = dyn.batch_apply(
        dyn_params, x3.reshape(B * A, N), u.reshape(B * A, M)
    ).reshape(B, A, N)
    return nx, u, c


def _fused_args(dyn_params, cost, raw_w):
    w = jax.nn.sigmoid(raw_w)
    w_ag = w[3] if raw_w.shape[-1] > 3 else jnp.zeros(())
    gain = raw_w[4] if raw_w.shape[-1] > 4 else jnp.ones(())
    wvec = jnp.stack([w[0], w[1], w_ag, gain]).reshape(1, 4)
    layers = dense_stack(dyn_params)
    ag_scale = cost.action_goal_scale if raw_w.shape[-1] > 3 else 0.0
    return wvec, layers, ag_scale


def test_fused_step_matches_solver_callbacks():
    for raw_dim, sq in [(5, True), (4, False), (3, False)]:
        (dyn, dp, cost, raw_w, x3, Xref, Uref, k, Kg, goal, goal_u,
         alphaBA) = _setup(raw_dim=raw_dim, ag_squared=sq)
        wvec, layers, ag_scale = _fused_args(dp, cost, raw_w)
        nx, u, c = fl.fused_ls_step(
            x3, Xref, Uref, alphaBA, k, Kg, goal, goal_u, wvec, layers,
            gs=GS, action_goal_squared=sq, ag_scale=ag_scale,
        )
        nx_r, u_r, c_r = _reference_step(
            dyn, dp, cost, raw_w, x3, Xref, Uref, k, Kg, goal, goal_u,
            alphaBA,
        )
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_r),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(nx), np.asarray(nx_r),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c), np.asarray(c_r),
                                   atol=1e-5, rtol=1e-5)


def test_batch_ilqr_fused_matches_plain():
    import dataclasses

    import __graft_entry__ as ge

    policy, params, xs, us = ge._flagship(
        horizon=6, max_iterations=4, tiny=True, x_size=N, u_size=M
    )
    key = jax.random.PRNGKey(3)
    hx = 0.1 * jax.random.normal(key, (B, 2, N))
    hu = jnp.zeros((B, 1, M))

    sol_off = policy.plan_batch(params, hx, hu)
    policy.settings = dataclasses.replace(policy.settings, fused_ls="on")
    try:
        sol_on = policy.plan_batch(params, hx, hu)
    finally:
        policy.settings = dataclasses.replace(
            policy.settings, fused_ls="auto"
        )
    np.testing.assert_allclose(
        np.asarray(sol_on.obj), np.asarray(sol_off.obj), rtol=2e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sol_on.U), np.asarray(sol_off.U), atol=2e-3
    )


def test_pallas_kernel_interpret_matches_fallback():
    (dyn, dp, cost, raw_w, x3, Xref, Uref, k, Kg, goal, goal_u,
     alphaBA) = _setup()
    wvec, layers, ag_scale = _fused_args(dp, cost, raw_w)
    # pad the lane axis up to the kernel's row tile
    reps = fl._B_TILE // B
    tile = lambda a: jnp.tile(a, (reps,) + (1,) * (a.ndim - 1))
    args = tuple(map(tile, (x3, Xref, Uref, alphaBA, k, Kg, goal,
                            goal_u)))
    kw = dict(gs=GS, action_goal_squared=True, ag_scale=ag_scale)
    ref = fl.fused_ls_step(*args, wvec, layers, **kw)
    fl._INTERPRET = True
    try:
        out = fl.fused_ls_step(*args, wvec, layers, **kw)
    finally:
        fl._INTERPRET = False
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)
