"""Ensemble dynamics (EP axis) + walker env + humanoid-scale pieces."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_mpc_tpu.envs import make_env
from gan_mpc_tpu.models import (
    CostFeatureNet,
    ExpertPredictor,
    MPCCost,
    ResidualMLPDynamicsNet,
)
from gan_mpc_tpu.models.ensemble import EnsembleDynamics
from gan_mpc_tpu.parallel import make_mesh, make_sharded_ensemble_step, shard_batch
from gan_mpc_tpu.planner import SolverSettings
from gan_mpc_tpu.policies import MPCPolicy
from gan_mpc_tpu.training.masking import masked_adam
import optax

KEY = jax.random.PRNGKey(0)
X, U = 4, 2


def _ensemble(members=4):
    return EnsembleDynamics(
        ResidualMLPDynamicsNet(x_size=X, hidden=(16,)), num_members=members
    )


def test_ensemble_init_and_mean_prediction():
    ens = _ensemble()
    params = ens.init(KEY, U)
    # stacked leading member axis
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.shape[0] == 4 for l in leaves)
    xc = jax.random.normal(KEY, (X,))
    u = jnp.ones((U,))
    members = ens.member_predict(xc, u, 0, params)
    assert members.shape == (4, X)
    mean = ens(xc, u, 0, params)
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(members.mean(0)), atol=1e-6
    )
    # members differ (independent init) -> positive disagreement
    assert float(ens.disagreement(xc, u, 0, params).max()) > 0.0


def test_ensemble_plugs_into_policy_and_planner():
    ens = _ensemble(members=3)
    policy = MPCPolicy(
        cost_model=MPCCost(CostFeatureNet(hidden=(8,), features_out=2), 3),
        dynamics_model=ens,
        expert_model=ExpertPredictor(
            x_size=X, u_size=U, arch="mlp", features=0, hidden=(8,)
        ),
        horizon=3,
        settings=SolverSettings(max_iterations=4),
    )
    params = policy.init(KEY, (-2.0, 3.0, -3.0), U)
    hist_x = 0.1 * jax.random.normal(KEY, (2, X))
    hist_u = jnp.zeros((1, U))
    sol = policy.plan(params, hist_x, hist_u)
    assert sol.U.shape == (3, U)
    assert bool(jnp.all(jnp.isfinite(sol.U)))
    # bilevel gradient flows into every member
    from gan_mpc_tpu.policies.losses import l2_imitation_loss

    Y = jnp.zeros((1, 4, X))
    loss, grads = policy.batched_loss_and_grad(
        params, hist_x[None], l2_imitation_loss, (Y,)
    )
    assert jnp.isfinite(loss)
    gleaves = jax.tree_util.tree_leaves(grads["cost_params"])
    assert any(float(jnp.abs(g).max()) > 0 for g in gleaves)


def test_sharded_ensemble_step_on_mesh():
    mesh = make_mesh(8, axis_names=("ep",))
    ens = _ensemble(members=8)
    params = ens.init(KEY, U)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    E, B, T = 8, 4, 3
    k1, k2, k3 = jax.random.split(KEY, 3)
    Xm = jax.random.normal(k1, (E, B, T, X))
    Um = jax.random.normal(k2, (E, B, T, U))
    Ym = jax.random.normal(k3, (E, B, T, X))
    step = make_sharded_ensemble_step(
        ens, opt, mesh, gamma=0.9, opt_state_template=opt_state
    )
    sharded = shard_batch((params, Xm, Um, Ym), mesh, axis="ep")
    p2, _, loss = step(
        sharded[0], opt_state, *sharded[1:], jnp.asarray(True)
    )
    assert jnp.isfinite(loss)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), params, p2
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


def test_walker_env_api():
    env = make_env("walker_walk")
    p = env.default_params()
    s = env.reset(p, KEY)
    obs = env.observe(p, s)
    assert obs.shape == (17,)
    s2, r = env.step(p, s, jnp.zeros(6))
    assert 0.0 <= float(r) <= 1.0
    # standing tall near init -> decent reward
    assert float(r) > 0.3


def test_walker_fall_rests_on_ground():
    env = make_env("walker_walk")
    p = env.default_params()
    s = env.reset(p, KEY)

    @jax.jit
    def roll(s):
        def body(c, _):
            c, r = env.step(p, c, jnp.zeros(6))
            return c, c.qpos[1]

        return jax.lax.scan(body, s, None, length=600)

    _, zs = roll(s)
    assert bool(jnp.all(jnp.isfinite(zs)))
    assert float(zs.min()) > -0.3  # never tunnels through the floor


def test_walker_scripted_expert_collects():
    from gan_mpc_tpu.runners.collect import collect_expert_trajectories

    env = make_env("walker_walk")
    ts = collect_expert_trajectories(env, 2, KEY, num_steps=200)
    assert ts.states.shape == (2, 200, 17)
    assert float(ts.rewards.sum(1).mean()) > 30.0


def test_long_horizon_ensemble_planning():
    """H=50 with associative Riccati + CG bilevel — the humanoid-scale
    planner configuration (BASELINE configs[4]) at toy sizes."""
    ens = _ensemble(members=2)
    policy = MPCPolicy(
        cost_model=MPCCost(CostFeatureNet(hidden=(8,), features_out=2), 50),
        dynamics_model=ens,
        expert_model=ExpertPredictor(
            x_size=X, u_size=U, arch="mlp", features=0, hidden=(8,)
        ),
        horizon=50,
        settings=SolverSettings(
            max_iterations=3, riccati="associative"
        ),
        bilevel_solver="cg",
    )
    params = policy.init(KEY, (-2.0, 3.0, -3.0), U)
    hist_x = 0.1 * jax.random.normal(KEY, (2, X))
    sol = policy.plan(params, hist_x, jnp.zeros((1, U)))
    assert sol.U.shape == (50, U)
    assert bool(jnp.all(jnp.isfinite(sol.U)))
