"""Differentiating through the MPC planner (bilevel / implicit gradient).

Capability parity with the reference's hand-rolled implicit-function-theorem
machinery (``/root/reference/policy/optimizers.py:34-105``), redesigned as a
``jax.custom_vjp`` on the planner itself: the planner becomes an ordinary
differentiable JAX function, so outer losses (L2-to-expert, GAN generator
loss, anything else) are written as plain differentiable code and
``jax.grad``/``jax.vmap`` compose with it.

Math. The inner problem is U* = argmin_U J(U; theta) solved by iLQR. At the
optimum g(U*, theta) := dJ/dU = 0, so the IFT gives

    dU*/dtheta = -A^{-1} (d^2 J / dU dtheta),   A := d^2 J / dU^2.

For an outer loss L that consumes the planner outputs, the cotangent
pullback is

    theta_bar = -(d^2 J / dtheta dU)^T A^{-1} u_bar_eff,

where u_bar_eff folds the X cotangent back onto U through the rollout.
The reference materializes A densely and solves (``optimizers.py:64-67``);
we offer that as ``solver="dense"`` (with a ridge — the reference does not
regularize, which is fragile) and a matrix-free conjugate-gradient solver
(``solver="cg"``) using Hessian-vector products for long horizons where the
dense ``(T*m)^2`` Hessian would blow memory (SURVEY.md §7 hard-part #1).

Note: the reference's ``bilevel_optimization`` returns ``+H·dJ/dU``
differentiated w.r.t. theta, which is the NEGATIVE of the true descent
gradient (cf. Amos et al., "Differentiable MPC"). This implementation uses
the mathematically correct sign, verified against finite differences in
``tests/test_bilevel.py``.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from gan_mpc_tpu.planner.ilqr import (
    ILQRSolution,
    SolverSettings,
    ilqr,
    rollout,
)
from gan_mpc_tpu.planner.linalg import solve_spd


def _tree_zeros(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def _tree_scale(tree, s):
    return jax.tree_util.tree_map(lambda x: x * s, tree)


def make_implicit_planner(
    cost: Callable,
    dynamics: Callable,
    settings: SolverSettings = SolverSettings(),
    *,
    terminal_cost: Callable = None,
    solver: str = "dense",
    ridge: float = 1e-5,
    cg_iters: int = 64,
) -> Callable:
    """Build a differentiable planner.

    Args:
      cost: ``cost(x, u, t, theta, *cost_args) -> scalar`` (every step, or
        stage-only when ``terminal_cost`` is given).
      dynamics: ``dynamics(x, u, t, theta, *dynamics_args) -> next_x``.
      terminal_cost: optional ``terminal_cost(x, theta, *cost_args)`` —
        splitting the terminal out avoids evaluating it (usually a neural
        net) at every step of every rollout under AD.
      settings: static iLQR settings.
      solver: ``"dense"`` (materialize the (T*m)^2 Hessian, exact solve) or
        ``"cg"`` (matrix-free HVP conjugate gradient, for long horizons).
      ridge: Tikhonov regularizer added to the Hessian before solving.
      cg_iters: CG iteration cap when ``solver == "cg"``.

    Returns:
      ``plan(theta, x0, U0, cost_args, dynamics_args) -> ILQRSolution``
      with a custom VJP. Gradients flow to ``theta`` (through both the cost
      and the dynamics theta-dependence). ``x0`` / ``U0`` / ``cost_args`` /
      ``dynamics_args`` receive zero cotangents, matching the reference's
      training semantics (goals and warm starts are not differentiated;
      ``/root/reference/policy/base.py:87-128``).
    """

    if solver not in ("dense", "cg"):
        raise ValueError(f"unknown bilevel solver {solver!r}")

    from gan_mpc_tpu.planner.ilqr import _make_total_fn

    def _bind(theta, cost_args):
        c = lambda x, u, t: cost(x, u, t, theta, *cost_args)
        tc = (
            None
            if terminal_cost is None
            else (lambda x: terminal_cost(x, theta, *cost_args))
        )
        return c, tc

    def _objective(U, theta, x0, cost_args, dynamics_args):
        c, tc = _bind(theta, cost_args)
        d = lambda x, u, t: dynamics(x, u, t, theta, *dynamics_args)
        return _make_total_fn(c, tc)(rollout(d, U, x0), U)

    @jax.custom_vjp
    def plan(theta, x0, U0, cost_args, dynamics_args) -> ILQRSolution:
        c, tc = _bind(theta, cost_args)
        d = lambda x, u, t: dynamics(x, u, t, theta, *dynamics_args)
        return ilqr(c, d, x0, U0, settings, tc)

    def fwd(theta, x0, U0, cost_args, dynamics_args):
        sol = plan(theta, x0, U0, cost_args, dynamics_args)
        residuals = (theta, x0, U0, sol.U, cost_args, dynamics_args)
        return sol, residuals

    def bwd(residuals, sol_bar: ILQRSolution):
        theta, x0, U0, Ustar, cost_args, dynamics_args = residuals
        T, m = Ustar.shape

        # Fold the X cotangent back through the rollout onto U and theta.
        def rollout_fn(U, th):
            d = lambda x, u, t: dynamics(x, u, t, th, *dynamics_args)
            return rollout(d, U, x0)

        _, pullback = jax.vjp(rollout_fn, Ustar, theta)
        dU_from_X, dtheta_from_X = pullback(sol_bar.X)
        u_bar = (sol_bar.U + dU_from_X).reshape(T * m)

        obj_fn = lambda U, th: _objective(
            U, th, x0, cost_args, dynamics_args
        )
        flat_grad = lambda u_flat, th: jax.grad(obj_fn)(
            u_flat.reshape(T, m), th
        ).reshape(T * m)

        if solver == "dense":
            A = jax.jacfwd(flat_grad)(Ustar.reshape(T * m), theta)
            A = (A + A.T) / 2.0 + ridge * jnp.eye(T * m, dtype=A.dtype)
            # Custom-call-free for small T*m (see planner/linalg.py);
            # falls back to LU above SMALL_MAX.
            v = solve_spd(A, u_bar[:, None])[:, 0]
        else:
            u_flat = Ustar.reshape(T * m)

            def hvp(w):
                _, tangent = jax.jvp(
                    lambda u: flat_grad(u, theta), (u_flat,), (w,)
                )
                return tangent + ridge * w

            v, _ = jax.scipy.sparse.linalg.cg(
                hvp, u_bar, maxiter=cg_iters
            )

        # theta_bar = -(d/dtheta) <v, g(U*, theta)>  (IFT term)
        ift = jax.grad(
            lambda th: jnp.vdot(v, flat_grad(Ustar.reshape(T * m), th))
        )(theta)
        theta_bar = _tree_add(dtheta_from_X, _tree_scale(ift, -1.0))

        # Envelope term if anyone differentiates the objective value.
        env = jax.grad(lambda th: obj_fn(Ustar, th))(theta)
        theta_bar = _tree_add(theta_bar, _tree_scale(env, sol_bar.obj))

        return (
            theta_bar,
            jnp.zeros_like(x0),
            jnp.zeros_like(U0),
            _tree_zeros(cost_args),
            _tree_zeros(dynamics_args),
        )

    plan.defvjp(fwd, bwd)
    return plan
