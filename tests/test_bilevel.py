"""Finite-difference verification of the implicit (bilevel) planner gradient.

This is the highest-risk math in the framework (SURVEY.md §7 hard-part #1);
the reference's equivalent is /root/reference/policy/optimizers.py:34-105.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_mpc_tpu.planner import SolverSettings, make_implicit_planner
from gan_mpc_tpu.planner.ilqr import ilqr, rollout

T = 8
N, M = 2, 1
SETTINGS = SolverSettings(max_iterations=100, grad_norm_tol=1e-7)

A_MAT = jnp.array([[1.0, 0.1], [-0.05, 0.98]])
B_MAT = jnp.array([[0.0], [0.1]])


def cost(x, u, t, theta, goal_X):
    goal = goal_X[t]
    stage = jnp.sum((x - goal) ** 2) * theta["w_state"] + 0.1 * jnp.sum(u**2)
    term = jnp.sum((x - goal) ** 2) * theta["w_term"]
    return jnp.where(t == T, term, stage)


def dynamics(x, u, t, theta):
    return A_MAT @ x + B_MAT @ u + theta["bias"]


def _outer_loss(plan, theta, x0, U0, goal_X, target_X):
    sol = plan(theta, x0, U0, (goal_X,), ())
    return jnp.sum(jnp.mean((sol.X - target_X) ** 2, axis=0))


@pytest.fixture(scope="module")
def problem():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    theta = {
        "w_state": jnp.float32(1.3),
        "w_term": jnp.float32(2.1),
        "bias": 0.01 * jax.random.normal(k3, (N,)),
    }
    x0 = jnp.array([0.8, -0.2])
    U0 = jnp.zeros((T, M))
    goal_X = 0.3 * jax.random.normal(k1, (T + 1, N))
    target_X = 0.3 * jax.random.normal(k2, (T + 1, N))
    return theta, x0, U0, goal_X, target_X


@pytest.mark.parametrize("solver", ["dense", "cg"])
def test_bilevel_gradient_matches_finite_differences(problem, solver):
    theta, x0, U0, goal_X, target_X = problem
    plan = make_implicit_planner(
        cost, dynamics, SETTINGS, solver=solver, ridge=1e-8
    )
    loss_fn = lambda th: _outer_loss(plan, th, x0, U0, goal_X, target_X)
    grads = jax.grad(loss_fn)(theta)

    eps = 1e-3
    for name in ("w_state", "w_term"):
        tp = dict(theta)
        tp[name] = theta[name] + eps
        tm = dict(theta)
        tm[name] = theta[name] - eps
        fd = (float(loss_fn(tp)) - float(loss_fn(tm))) / (2 * eps)
        np.testing.assert_allclose(
            float(grads[name]), fd, rtol=0.05, atol=1e-4
        ), name

    # dynamics-theta path (flows through both IFT and the rollout pullback)
    for i in range(N):
        dv = jnp.zeros(N).at[i].set(eps)
        tp = dict(theta)
        tp["bias"] = theta["bias"] + dv
        tm = dict(theta)
        tm["bias"] = theta["bias"] - dv
        fd = (float(loss_fn(tp)) - float(loss_fn(tm))) / (2 * eps)
        np.testing.assert_allclose(
            float(grads["bias"][i]), fd, rtol=0.05, atol=1e-4
        )


def test_bilevel_objective_envelope_gradient(problem):
    """d obj / d theta should equal the partial dJ/dtheta at U* (envelope)."""
    theta, x0, U0, goal_X, _ = problem
    plan = make_implicit_planner(cost, dynamics, SETTINGS, ridge=1e-8)

    def obj_of_theta(th):
        return plan(th, x0, U0, (goal_X,), ()).obj

    g = jax.grad(obj_of_theta)(theta)
    eps = 1e-3
    tp = dict(theta)
    tp["w_state"] = theta["w_state"] + eps
    tm = dict(theta)
    tm["w_state"] = theta["w_state"] - eps
    fd = (float(obj_of_theta(tp)) - float(obj_of_theta(tm))) / (2 * eps)
    np.testing.assert_allclose(float(g["w_state"]), fd, rtol=0.05)


def test_bilevel_vmaps_over_batch(problem):
    theta, x0, U0, goal_X, target_X = problem
    plan = make_implicit_planner(cost, dynamics, SETTINGS)
    x0s = jnp.stack([x0, x0 * 0.5, -x0])

    def batch_loss(th):
        losses = jax.vmap(
            lambda x: _outer_loss(plan, th, x, U0, goal_X, target_X)
        )(x0s)
        return jnp.mean(losses)

    val, grads = jax.value_and_grad(batch_loss)(theta)
    assert jnp.isfinite(val)
    assert all(
        bool(jnp.all(jnp.isfinite(v))) for v in jax.tree_util.tree_leaves(grads)
    )


def test_planner_forward_matches_plain_ilqr(problem):
    theta, x0, U0, goal_X, _ = problem
    plan = make_implicit_planner(cost, dynamics, SETTINGS)
    sol = plan(theta, x0, U0, (goal_X,), ())
    c = lambda x, u, t: cost(x, u, t, theta, goal_X)
    d = lambda x, u, t: dynamics(x, u, t, theta)
    ref = ilqr(c, d, x0, U0, SETTINGS)
    np.testing.assert_allclose(
        np.asarray(sol.U), np.asarray(ref.U), atol=1e-6
    )
    X = rollout(d, sol.U, x0)
    np.testing.assert_allclose(np.asarray(sol.X), np.asarray(X), atol=1e-6)
