"""iLQR solver tests against analytic LQR oracles (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_mpc_tpu.planner import SolverSettings, ilqr, rollout, total_cost


def _lqr_oracle(A, B, Q, R, Qf, x0, T):
    """Finite-horizon discrete LQR via backward Riccati (numpy, float64)."""
    A, B, Q, R, Qf = (np.asarray(v, np.float64) for v in (A, B, Q, R, Qf))
    P = Qf
    Ks = []
    for _ in range(T):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ A - A.T @ P @ B @ K
        Ks.append(K)
    Ks = Ks[::-1]
    x = np.asarray(x0, np.float64)
    U = []
    for t in range(T):
        u = -Ks[t] @ x
        U.append(u)
        x = A @ x + B @ u
    return np.stack(U)


def _make_lqr_problem():
    A = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    B = jnp.array([[0.0], [0.1]])
    Q = 0.5 * jnp.eye(2)
    R = 0.5 * jnp.eye(1)
    Qf = 5.0 * jnp.eye(2)
    T = 10
    x0 = jnp.array([1.0, 0.0])

    def cost(x, u, t):
        stage = 0.5 * (x @ Q @ x) + 0.5 * (u @ R @ u)
        term = 0.5 * (x @ Qf @ x)
        return jnp.where(t == T, term, stage)

    def dynamics(x, u, t):
        return A @ x + B @ u

    return cost, dynamics, (A, B, Q, R, Qf), x0, T


def test_ilqr_matches_analytic_lqr():
    cost, dynamics, (A, B, Q, R, Qf), x0, T = _make_lqr_problem()
    U0 = jnp.zeros((T, 1))
    sol = ilqr(cost, dynamics, x0, U0)
    # Uniform 0.5-scaling of the objective does not change the argmin, so
    # the oracle uses (Q, R, Qf) directly.
    U_star = _lqr_oracle(A, B, Q, R, Qf, x0, T)
    np.testing.assert_allclose(np.asarray(sol.U), U_star, atol=1e-4)
    assert bool(sol.converged)
    assert int(sol.iterations) <= 3  # LQR solves in one Newton step


def test_ilqr_objective_consistent():
    cost, dynamics, _, x0, T = _make_lqr_problem()
    sol = ilqr(cost, dynamics, x0, jnp.zeros((T, 1)))
    X = rollout(dynamics, sol.U, x0)
    np.testing.assert_allclose(np.asarray(sol.X), np.asarray(X), atol=1e-5)
    np.testing.assert_allclose(
        float(sol.obj), float(total_cost(cost, X, sol.U)), rtol=1e-5
    )


def test_ilqr_nonlinear_pendulum_converges():
    """Torque-limited pendulum swing toward upright: obj must drop a lot."""
    dt = 0.05

    def dynamics(x, u, t):
        th, thdot = x[0], x[1]
        thddot = -9.81 * jnp.sin(th) + 5.0 * jnp.tanh(u[0])
        thdot = thdot + dt * thddot
        return jnp.array([th + dt * thdot, thdot])

    def cost(x, u, t):
        upright = (jnp.cos(x[0]) - 1.0) ** 2 + 0.05 * x[1] ** 2
        return jnp.where(t == 40, 20.0 * upright, upright + 0.01 * u[0] ** 2)

    x0 = jnp.array([jnp.pi - 0.4, 0.3])  # off the unstable equilibrium
    U0 = jnp.zeros((40, 1))
    obj0 = total_cost(cost, rollout(dynamics, U0, x0), U0)
    sol = ilqr(cost, dynamics, x0, U0, SolverSettings(max_iterations=100))
    assert float(sol.obj) < 0.3 * float(obj0)
    assert bool(sol.converged)
    assert jnp.all(jnp.isfinite(sol.U))


def test_ilqr_vmaps_over_batch():
    cost, dynamics, _, _, T = _make_lqr_problem()
    x0s = jnp.stack([jnp.array([1.0, 0.0]), jnp.array([-0.5, 0.3])])
    U0s = jnp.zeros((2, T, 1))
    sols = jax.vmap(lambda x, u: ilqr(cost, dynamics, x, u))(x0s, U0s)
    assert sols.U.shape == (2, T, 1)
    assert bool(jnp.all(sols.converged))
    # Each batch element matches the single solve.
    single = ilqr(cost, dynamics, x0s[1], U0s[1])
    np.testing.assert_allclose(
        np.asarray(sols.U[1]), np.asarray(single.U), atol=1e-5
    )


def test_ilqr_respects_maxiter():
    cost, dynamics, _, x0, T = _make_lqr_problem()
    sol = ilqr(
        cost, dynamics, x0, jnp.zeros((T, 1)), SolverSettings(max_iterations=1)
    )
    assert int(sol.iterations) <= 1


@pytest.mark.parametrize("psd_delta", [0.0, 1e-3])
def test_ilqr_psd_option(psd_delta):
    cost, dynamics, _, x0, T = _make_lqr_problem()
    sol = ilqr(
        cost,
        dynamics,
        x0,
        jnp.zeros((T, 1)),
        SolverSettings(psd_delta=psd_delta),
    )
    assert bool(sol.converged)


def test_split_terminal_cost_matches_combined():
    """The stage/terminal split path must produce the same solution as the
    combined cost(x, u, t) form (t == T selecting the terminal)."""
    T = 8

    def stage(x, u, t):
        return jnp.sum((x - 0.3) ** 2) + 0.05 * jnp.sum(u**2)

    def terminal(x):
        return 4.0 * jnp.sum(jnp.tanh(x) ** 2)

    def combined(x, u, t):
        return jnp.where(t == T, terminal(x), stage(x, u, t))

    def dynamics(x, u, t):
        return x + 0.1 * jnp.tanh(u) + 0.05 * jnp.sin(x)

    x0 = jnp.array([0.6, -0.4])
    U0 = jnp.zeros((T, 2))
    settings = SolverSettings(grad_norm_tol=1e-6, max_iterations=300)
    a = ilqr(combined, dynamics, x0, U0, settings)
    b = ilqr(stage, dynamics, x0, U0, settings, terminal)
    # same optimum to solver tolerance (fp rounding differs per path)
    np.testing.assert_allclose(np.asarray(a.U), np.asarray(b.U), atol=2e-3)
    np.testing.assert_allclose(float(a.obj), float(b.obj), rtol=1e-5)
