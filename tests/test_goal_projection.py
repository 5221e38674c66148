"""Goal-feasibility projection (policies/mpc.py project_goals).

Under domain shift the expert's goal states can be dynamically
infeasible for the imitator's body; the projection pre-pass replaces
them with the closest REACHABLE states under the learned dynamics. The
defining property: the projected goals are exactly a rollout of the
dynamics under the returned warm-start actions.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gan_mpc_tpu.models import (
    CostFeatureNet,
    ExpertPredictor,
    LearnedDynamics,
    MPCCost,
    ResidualMLPDynamicsNet,
)
from gan_mpc_tpu.planner import SolverSettings
from gan_mpc_tpu.policies import MPCPolicy

KEY = jax.random.PRNGKey(0)
H, X, U = 5, 4, 2


def _policy(goal_projection=3):
    return MPCPolicy(
        cost_model=MPCCost(CostFeatureNet(hidden=(8,), features_out=2), H),
        dynamics_model=LearnedDynamics(
            ResidualMLPDynamicsNet(x_size=X, hidden=(16,))
        ),
        expert_model=ExpertPredictor(
            x_size=X, u_size=U, arch="mlp", features=0, hidden=(8,)
        ),
        horizon=H,
        settings=SolverSettings(max_iterations=3),
        goal_projection=goal_projection,
    )


def test_projected_goals_are_exactly_reachable():
    policy = _policy()
    params = policy.init(KEY, (-2.0, 3.0, -3.0), U)
    x0 = jax.random.normal(KEY, (X,))
    goals = jnp.concatenate(
        [x0[None], 2.0 * jax.random.normal(jax.random.PRNGKey(1), (H, X))]
    )
    u0 = jnp.zeros((H, U))
    G, Useq = policy.project_goals(params["dynamics_params"], x0, goals, u0)
    assert G.shape == goals.shape and Useq.shape == u0.shape
    # defining property: G[1:] is the dynamics rollout under Useq
    x = x0
    for t in range(H):
        x = policy.dynamics_model(x, Useq[t], 0, params["dynamics_params"])
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(G[t + 1]), atol=1e-5
        )
    # actions respect the torque bounds
    assert float(jnp.abs(Useq).max()) <= 1.0 + 1e-6
    # Gauss-Newton tracked the (infeasible) goals at least as well as the
    # zero-action warm start would have, step by step from the same states
    def step_dist(u_seq):
        x, total = x0, 0.0
        for t in range(H):
            x_next = policy.dynamics_model(
                x, u_seq[t], 0, params["dynamics_params"]
            )
            total += float(jnp.sum((x_next - goals[t + 1]) ** 2))
            x = x_next
        return total

    assert step_dist(Useq) <= step_dist(u0) + 1e-6


def test_projection_wired_into_plan_and_batch():
    policy = _policy()
    params = policy.init(KEY, (-2.0, 3.0, -3.0), U)
    hx = 0.1 * jax.random.normal(KEY, (2, X))
    hu = jnp.zeros((1, U))
    sol = jax.jit(
        lambda p, a, b: policy.plan(p, a, b, warm_start_carry=False)
    )(params, hx, hu)
    assert bool(jnp.isfinite(sol.obj))
    hX = 0.1 * jax.random.normal(KEY, (3, 2, X))
    hU = jnp.zeros((3, 1, U))
    solb = jax.jit(policy.plan_batch)(params, hX, hU)
    assert solb.U.shape == (3, H, U)
    assert bool(jnp.all(jnp.isfinite(solb.obj)))


def test_action_goal_target_survives_projection():
    """With the 4-weight action-goal cost AND goal projection on, the
    planner's action-goal target must be the predictor's pre-projection
    cloned actions (the BC signal), NOT the projected warm start.
    Regression: the projected-actions-as-target variant measured 15.5 on
    the shifted cheetah vs 27.7 for cloned-action tracking."""
    policy = _policy(goal_projection=3)
    # huge squared action-goal term so the optimum pins U to the target
    policy.cost_model.action_goal_scale = 1e4
    policy.cost_model.action_goal_squared = True
    params = policy.init(KEY, (-20.0, -20.0, -20.0, 20.0), U)
    hx = 0.1 * jax.random.normal(KEY, (2, X))
    hu = jnp.zeros((1, U))
    goals, u_cloned = policy.goals_and_warm_start(params, hx)
    _, u_proj = policy.project_goals(
        params["dynamics_params"], hx[-1], goals, u_cloned
    )
    # make sure the two candidate targets actually differ
    assert float(jnp.abs(u_cloned - u_proj).max()) > 1e-4
    sol = policy.plan(params, hx, hu, warm_start_carry=False)
    d_cloned = float(jnp.abs(sol.U - u_cloned).max())
    d_proj = float(jnp.abs(sol.U - u_proj).max())
    assert d_cloned < 1e-2, d_cloned
    assert d_cloned < d_proj
    # batch-native path pins to the same target
    solb = policy.plan_batch(params, hx[None], hu[None])
    np.testing.assert_allclose(
        np.asarray(solb.U[0]), np.asarray(sol.U), atol=1e-3
    )


def test_projection_off_matches_previous_behavior():
    """goal_projection=0 must leave the plan identical to a policy built
    without the feature (default-off regression guard)."""
    p_off = _policy(goal_projection=0)
    params = p_off.init(KEY, (-2.0, 3.0, -3.0), U)
    hx = 0.1 * jax.random.normal(KEY, (2, X))
    hu = jnp.zeros((1, U))
    sol = p_off.plan(params, hx, hu, warm_start_carry=False)
    goals, useq = p_off.goals_and_warm_start(params, hx)
    # with projection off the solver consumed the raw expert goals: the
    # planner's objective evaluated at its own solution must match a
    # fresh planner given identical inputs
    sol2 = p_off._plan(
        p_off._theta(params), hx[-1], useq, (goals, useq), ()
    )
    np.testing.assert_allclose(
        float(sol.obj), float(sol2.obj), rtol=1e-6
    )
