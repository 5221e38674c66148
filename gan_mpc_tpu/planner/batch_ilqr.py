"""Batch-native iLQR: one solver instance for a whole (B,)-batch of
planning problems.

``ilqr.py`` solves a single problem and is batched from outside with
``jax.vmap`` — correct, but the callbacks then trace per-instance, so
fused batch ops (``ops/fused_mlp.py``) can never see the real batch, and
the outer ``while_loop`` under vmap makes every lane run lockstep anyway.
This module is the batch-major formulation (the round-1 ROADMAP's #1
item): every callback receives the WHOLE batch, the iteration loop is a
single ``while_loop`` whose condition is "any lane still active", and
per-lane convergence / line-search / Levenberg-Marquardt state is carried
as (B,) arrays with masked updates. Matches ``vmap(ilqr)`` numerically
(``tests/test_batch_ilqr.py``).

Performance notes (v5e measurements drove these choices):

  * all horizon-indexed arrays are TIME-MAJOR internally — X (T+1, B, n),
    U (T, B, m), A (T, B, n, n) — so every ``lax.scan`` consumes its
    inputs without per-iteration transposes, and flattening to (T*B)
    rows for the fused whole-horizon callbacks is a free reshape;
  * the line search only accumulates objectives (carry (B, A)); the
    winning trajectory is recomputed ONCE at each lane's best step size
    instead of stacking all A candidate trajectories and gathering;
  * cost quadratization is closed-form (see ``MPCCost.quad_batch``) and
    the dynamics linearization is a fused value-and-Jacobian
    (``ops.fused_mlp.mlp_value_and_jac``) — no AD in the iteration loop;
  * the tiny SPD gain solves use the unrolled Gauss-Jordan
    (``planner/linalg.py``), not a LAPACK custom call.

Reference provenance: same planner contract as trajax's ilqr
(``/root/reference/policy/optimizers.py:10-21``); the batch formulation
is new — the reference is single-instance, single-device.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp

from gan_mpc_tpu.planner.ilqr import ILQRSolution, SolverSettings
from gan_mpc_tpu.planner.linalg import solve_spd


@dataclasses.dataclass(frozen=True)
class BatchProblem:
    """Batch-major planner callbacks.

    dynamics_step: (X (B,K,n), U (B,K,m), t) -> (B,K,n) — K parallel
      rollouts per lane (K=1 plain rollout, K=num_alphas line search);
    dynamics_jac: (X (T,B,n), U (T,B,m)) -> (A (T,B,n,n), Bm (T,B,n,m));
    stage_cost: (X (B,K,n), U (B,K,m), t) -> (B,K);
    terminal_cost: (X (B,K,n)) -> (B,K);
    quad: (X (T+1,B,n), U (T,B,m)) -> (cx (T+1,B,n), cu (T,B,m),
      cxx (T+1,B,n,n), cuu (T,B,m,m), cux (T,B,m,n)).
    """

    dynamics_step: Callable
    dynamics_jac: Callable
    stage_cost: Callable
    terminal_cost: Callable
    quad: Callable

    def __hash__(self):
        return hash(
            (self.dynamics_step, self.dynamics_jac, self.stage_cost,
             self.terminal_cost, self.quad)
        )


def batch_rollout(problem: BatchProblem, U, x0, unroll=1):
    """U (T,B,m), x0 (B,n) -> X (T+1,B,n), obj (B,)."""
    T = U.shape[0]

    def step(carry, inp):
        x, acc = carry
        u, t = inp
        acc = acc + problem.stage_cost(x[:, None], u[:, None], t)[:, 0]
        nx = problem.dynamics_step(x[:, None], u[:, None], t)[:, 0]
        return (nx, acc), nx

    (xT, acc), tail = jax.lax.scan(
        step,
        (x0, jnp.zeros(x0.shape[0], x0.dtype)),
        (U, jnp.arange(T)),
        unroll=unroll,
    )
    X = jnp.concatenate([x0[None], tail], axis=0)
    obj = acc + problem.terminal_cost(xT[:, None])[:, 0]
    return X, obj


def _backward(A, Bm, cx, cu, cxx, cuu, cux, reg, settings):
    """Batched Riccati recursion (all inputs time-major). reg: (B,)."""
    B = A.shape[1]
    m = Bm.shape[-1]
    eye_m = jnp.eye(m, dtype=A.dtype)

    def step(carry, inp):
        Vx, Vxx, dv1, dv2 = carry
        At, Bt, cxt, cut, cxxt, cuut, cuxt = inp
        AtT = jnp.swapaxes(At, -1, -2)
        BtT = jnp.swapaxes(Bt, -1, -2)
        Qx = cxt + jnp.einsum("bji,bj->bi", At, Vx)
        Qu = cut + jnp.einsum("bji,bj->bi", Bt, Vx)
        AV = AtT @ Vxx  # (B,n,n)
        BV = BtT @ Vxx  # (B,m,n)
        Qxx = cxxt + AV @ At
        Quu = cuut + BV @ Bt
        Qux = cuxt + BV @ At
        Quu_reg = Quu + reg[:, None, None] * eye_m
        kK = solve_spd(
            Quu_reg, jnp.concatenate([Qu[..., None], Qux], axis=-1)
        )
        k, K = -kK[..., 0], -kK[..., 1:]
        KT = jnp.swapaxes(K, -1, -2)
        QuxT = jnp.swapaxes(Qux, -1, -2)
        Quu_k = jnp.einsum("bij,bj->bi", Quu, k)
        Vx_new = (
            Qx
            + jnp.einsum("bji,bj->bi", K, Quu_k)
            + jnp.einsum("bji,bj->bi", K, Qu)
            + jnp.einsum("bji,bj->bi", Qux, k)
        )
        Vxx_new = Qxx + KT @ (Quu @ K) + KT @ Qux + QuxT @ K
        Vxx_new = (Vxx_new + jnp.swapaxes(Vxx_new, -1, -2)) / 2.0
        dv1 = dv1 + jnp.einsum("bi,bi->b", k, Qu)
        dv2 = dv2 + 0.5 * jnp.einsum("bi,bi->b", k, Quu_k)
        return (Vx_new, Vxx_new, dv1, dv2), (k, K, Vx_new)

    zero = jnp.zeros(B, A.dtype)
    (_, _, dv1, dv2), (k, K, Vxs) = jax.lax.scan(
        step,
        (cx[-1], cxx[-1], zero, zero),
        (A, Bm, cx[:-1], cu, cxx[:-1], cuu, cux),
        reverse=True,
        unroll=settings.inner_unroll,
    )
    adjoints = jnp.concatenate([Vxs, cx[-1:]], axis=0)
    return k, K, dv1, dv2, adjoints


def _adjoint_gradient(A, Bm, cx, cu, unroll=1):
    """Exact per-lane open-loop gradient dJ/dU (T,B,m) via the costate
    recursion (cf. ``ilqr._adjoint_gradient``); inputs time-major."""

    def step(lam, inp):
        At, Bt, cxt, cut = inp
        g = cut + jnp.einsum("bji,bj->bi", Bt, lam)
        lam_new = cxt + jnp.einsum("bji,bj->bi", At, lam)
        return lam_new, g

    _, G = jax.lax.scan(
        step, cx[-1], (A, Bm, cx[:-1], cu), reverse=True, unroll=unroll
    )
    return G


def _line_search_objs(problem, X, U, k, K, alphas, unroll=1):
    """Objective of every (lane, alpha) closed-loop rollout: (B, A).

    Only the running objective is carried — no candidate trajectories are
    materialized; the winner is recomputed once afterwards.
    """
    B = X.shape[1]
    A_ = alphas.shape[0]
    x0 = jnp.broadcast_to(X[0][:, None], (B, A_, X.shape[-1]))

    def step(carry, inp):
        x, acc = carry
        Xref, Uref, kt, Kt, t = inp
        du = jnp.einsum("bmn,ban->bam", Kt, x - Xref[:, None])
        u = Uref[:, None] + alphas[None, :, None] * kt[:, None] + du
        acc = acc + problem.stage_cost(x, u, t)
        nx = problem.dynamics_step(x, u, t)
        return (nx, acc), None

    (xT, acc), _ = jax.lax.scan(
        step,
        (x0, jnp.zeros((B, A_), X.dtype)),
        (X[:-1], U, k, K, jnp.arange(U.shape[0])),
        unroll=unroll,
    )
    return acc + problem.terminal_cost(xT)


def _forward_best(problem, X, U, k, K, alpha_b, unroll=1):
    """Closed-loop rollout at each lane's OWN step size alpha_b (B,).
    Returns Xn (T+1,B,n), Un (T,B,m), obj (B,)."""
    B = X.shape[1]

    def step(carry, inp):
        x, acc = carry
        Xref, Uref, kt, Kt, t = inp
        u = (
            Uref
            + alpha_b[:, None] * kt
            + jnp.einsum("bmn,bn->bm", Kt, x - Xref)
        )
        acc = acc + problem.stage_cost(x[:, None], u[:, None], t)[:, 0]
        nx = problem.dynamics_step(x[:, None], u[:, None], t)[:, 0]
        return (nx, acc), (nx, u)

    (xT, acc), (tail, Un) = jax.lax.scan(
        step,
        (X[0], jnp.zeros(B, X.dtype)),
        (X[:-1], U, k, K, jnp.arange(U.shape[0])),
        unroll=unroll,
    )
    Xn = jnp.concatenate([X[:1], tail], axis=0)
    return Xn, Un, acc + problem.terminal_cost(xT[:, None])[:, 0]


@functools.partial(jax.jit, static_argnums=(0, 3))
def batch_ilqr(
    problem: BatchProblem,
    x0: jax.Array,
    U0: jax.Array,
    settings: SolverSettings = SolverSettings(),
) -> ILQRSolution:
    """Solve B planning problems jointly. x0 (B,n), U0 (B,T,m).

    Returns an ILQRSolution whose leaves carry a LEADING BATCH axis
    (X (B,T+1,n), U (B,T,m), ...). Per-lane line-search acceptance,
    Levenberg-Marquardt schedule, and convergence: a finished lane
    freezes while others iterate; the loop exits when all lanes are done
    or at their iteration cap.
    """
    x0 = x0.astype(jnp.float32)
    U0 = jnp.swapaxes(U0.astype(jnp.float32), 0, 1)  # -> (T, B, m)
    T, B, m = U0.shape
    n = x0.shape[-1]
    alphas = settings.alpha_0 * (
        settings.alpha_decay
        ** jnp.arange(settings.num_alphas, dtype=jnp.float32)
    )
    unroll = settings.inner_unroll

    X0, obj0 = batch_rollout(problem, U0, x0, unroll=unroll)
    state0 = dict(
        X=X0,
        U=U0,
        obj=obj0,
        grad=jnp.full((T, B, m), jnp.inf, jnp.float32),
        adj=jnp.zeros((T + 1, B, n), jnp.float32),
        reg=jnp.full((B,), settings.reg_init, jnp.float32),
        it=jnp.zeros((B,), jnp.int32),
        active=jnp.ones((B,), bool),
        converged=jnp.zeros((B,), bool),
    )

    def cond(s):
        # Lanes deactivate themselves at the iteration cap, so "anyone
        # still active" is the complete loop condition.
        return jnp.any(s["active"])

    def body(s):
        X, U, obj, reg = s["X"], s["U"], s["obj"], s["reg"]
        A, Bm = problem.dynamics_jac(X[:-1], U)
        cx, cu, cxx, cuu, cux = problem.quad(X, U)
        grad = _adjoint_gradient(A, Bm, cx, cu, unroll=unroll)
        gnorm = jnp.sqrt(jnp.sum(grad * grad, axis=(0, 2)))
        grad_small = gnorm < settings.grad_norm_tol

        k, K, dv1, dv2, adjoints = _backward(
            A, Bm, cx, cu, cxx, cuu, cux, reg, settings
        )
        objs = _line_search_objs(problem, X, U, k, K, alphas, unroll)
        objs = jnp.where(jnp.isfinite(objs), objs, jnp.inf)
        best = jnp.argmin(objs, axis=1)  # (B,)
        best_obj = jnp.take_along_axis(objs, best[:, None], axis=1)[:, 0]
        improved = best_obj < obj
        # Recompute only the winning rollout, at each lane's own alpha
        # (losing lanes get alpha 0 == reference trajectory, masked out
        # below anyway, so the recompute stays exact for them too).
        take = s["active"] & ~grad_small & improved
        alpha_b = jnp.where(take, alphas[best], 0.0)
        Xb, Ub, _ = _forward_best(problem, X, U, k, K, alpha_b, unroll)

        mask_tb = take[None, :, None]
        Xn = jnp.where(mask_tb, Xb, X)
        Un = jnp.where(mask_tb, Ub, U)
        objn = jnp.where(take, best_obj, obj)
        adjn = jnp.where(
            (s["active"] & ~grad_small)[None, :, None], adjoints, s["adj"]
        )
        gradn = jnp.where(s["active"][None, :, None], grad, s["grad"])
        regn = jnp.where(
            s["active"],
            jnp.where(
                improved,
                jnp.maximum(reg * settings.reg_down, settings.reg_min),
                jnp.minimum(reg * settings.reg_up, settings.reg_max),
            ),
            reg,
        )
        stalled = ~improved & (reg >= settings.reg_max)
        done_now = s["active"] & (grad_small | stalled)
        if settings.obj_step_tol > 0.0:
            step_small = improved & ((obj - objn) <= settings.obj_step_tol)
            done_now = done_now | (s["active"] & step_small)
        itn = s["it"] + s["active"].astype(jnp.int32)
        active = s["active"] & ~done_now & (itn < settings.max_iterations)
        return dict(
            X=Xn,
            U=Un,
            obj=objn,
            grad=gradn,
            adj=adjn,
            reg=regn,
            it=itn,
            active=active,
            converged=s["converged"] | done_now,
        )

    s = jax.lax.while_loop(cond, body, state0)
    bm = lambda a: jnp.swapaxes(a, 0, 1)  # -> batch-major for callers
    return ILQRSolution(
        X=bm(s["X"]),
        U=bm(s["U"]),
        obj=s["obj"],
        grad=bm(s["grad"]),
        adjoints=bm(s["adj"]),
        iterations=s["it"],
        converged=s["converged"],
    )
