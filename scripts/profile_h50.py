"""Per-phase timing of the humanoid-class (29-dim, H=50) batch iLQR step.

VERDICT r4 item 6: the long-horizon regime benches under the 10k
steps/sec north-star. This script times each phase of the batch solver
standalone at bench shapes so the optimization target is measured, not
guessed: linearization (dynamics_jac), cost quadratization (quad),
backward Riccati (sequential vs associative), line search (recompute vs
materialize), forward rollout, and the full solve.

Usage: python scripts/profile_h50.py [B] [T] [iters]
Env: PROF_ENV (default humanoid_stand obs/act sizes 29/12).
"""

import sys
import time

sys.path.insert(0, ".")

from gan_mpc_tpu import runtime_setup  # noqa: E402

runtime_setup.setup()  # honors JAX_PLATFORMS despite the TPU sitecustomize

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import __graft_entry__ as ge  # noqa: E402
from gan_mpc_tpu.planner.batch_ilqr import (
    BatchProblem,
    SolverSettings,
    _backward,
    _backward_associative,
    _line_search_objs,
    batch_ilqr,
    batch_rollout,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
T = int(sys.argv[2]) if len(sys.argv) > 2 else 50
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
N, M = 29, 12


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


def main():
    policy, params, x_size, u_size = ge._flagship(
        horizon=T, max_iterations=ITERS, x_size=N, u_size=M
    )
    key = jax.random.PRNGKey(0)
    history = 1  # matches __graft_entry__._flagship / bench.py
    hx = 0.1 * jax.random.normal(key, (B, history + 1, N))
    hu = jnp.zeros((B, history, M))

    # ---- full batch plan (the bench inner loop minus env stepping)
    plan = jax.jit(lambda p, x, u: policy.plan_batch(p, x, u))
    t_full = timeit("full plan_batch (settings as configured)", plan,
                    params, hx, hu)

    # ---- reconstruct the problem exactly as plan_batch does
    goal_X, init_U = jax.vmap(
        lambda h: policy.goals_and_warm_start(params, h)
    )(hx)
    goal_tm = jnp.swapaxes(goal_X, 0, 1)
    goal_u_tm = jnp.swapaxes(init_U, 0, 1)
    theta_c, theta_w = params["cost_params"], params["mpc_weights"]
    theta_d = params["dynamics_params"]
    cost_model, dyn_model = policy.cost_model, policy.dynamics_model

    def dynamics_step(X, U, t):
        del t
        b, k, n = X.shape
        nx = dyn_model.batch_apply(
            theta_d, X.reshape(b * k, n), U.reshape(b * k, -1))
        return nx.reshape(b, k, n)

    def dynamics_jac(X, U):
        t, b, n = X.shape
        _, A, Bm = dyn_model.batch_value_and_jac(
            theta_d, X.reshape(t * b, n), U.reshape(t * b, -1))
        return A.reshape(t, b, n, n), Bm.reshape(t, b, n, -1)

    problem = BatchProblem(
        dynamics_step=dynamics_step,
        dynamics_jac=dynamics_jac,
        stage_cost=lambda X, U, t: cost_model.stage_cost_batch(
            X, U, t, theta_w, goal_tm, goal_u_tm),
        terminal_cost=lambda X: cost_model.terminal_cost_batch(
            X, theta_c, theta_w),
        quad=lambda X, U: cost_model.quad_batch(
            X, U, theta_c, theta_w, goal_tm, goal_u_tm),
    )

    x0 = hx[:, -1]
    U0 = jnp.swapaxes(init_U, 0, 1)  # (T, B, m)
    X, obj = jax.jit(
        lambda u, x: batch_rollout(problem, u, x)
    )(U0, x0)
    jax.block_until_ready(X)

    t_fwd = timeit("forward batch_rollout (1 T-scan)",
                   jax.jit(lambda u, x: batch_rollout(problem, u, x)),
                   U0, x0)
    t_jac = timeit("dynamics_jac linearization (T*B rows)",
                   jax.jit(problem.dynamics_jac), X[:-1], U0)
    t_quad = timeit("cost quad_batch",
                    jax.jit(problem.quad), X, U0)

    A, Bm = jax.jit(problem.dynamics_jac)(X[:-1], U0)
    cx, cu, cxx, cuu, cux = jax.jit(problem.quad)(X, U0)
    reg = jnp.full((B,), 1e-3, jnp.float32)
    st = SolverSettings(max_iterations=ITERS)

    t_bwd_seq = timeit(
        "backward Riccati (sequential scan)",
        jax.jit(lambda *a: _backward(*a, st)),
        A, Bm, cx, cu, cxx, cuu, cux, reg)
    t_bwd_asc = timeit(
        "backward Riccati (associative)",
        jax.jit(lambda *a: _backward_associative(*a, st)),
        A, Bm, cx, cu, cxx, cuu, cux, reg)

    k, K, *_ = jax.jit(lambda *a: _backward(*a, st))(
        A, Bm, cx, cu, cxx, cuu, cux, reg)
    alphas = st.alpha_0 * (
        st.alpha_decay ** jnp.arange(st.num_alphas, dtype=jnp.float32))

    t_ls_rec = timeit(
        "line search objs (recompute mode)",
        jax.jit(lambda *a: _line_search_objs(
            problem, *a, 1, materialize=False)),
        X, U0, k, K, alphas)
    t_ls_mat = timeit(
        "line search objs (materialize mode)",
        jax.jit(lambda *a: _line_search_objs(
            problem, *a, 1, materialize=True)),
        X, U0, k, K, alphas)

    per_iter = t_jac + t_quad + min(t_bwd_seq, t_bwd_asc) + min(
        t_ls_rec, t_ls_mat) + t_fwd
    print(f"{'-- sum of best phases x 1 iter':42s} {per_iter:8.2f} ms")
    print(f"{'-- full solve measured':42s} {t_full:8.2f} ms "
          f"(~{ITERS} iters)")
    print(f"implied steps/sec at bench shapes: "
          f"{B * 1 / (t_full / 1e3):.0f} env-steps/sec per control step "
          f"(bench does 1 plan per env step)")


if __name__ == "__main__":
    main()
