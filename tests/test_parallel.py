"""Multi-device tests on the 8-virtual-CPU mesh: sharded training steps
must agree numerically with the single-device implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_mpc_tpu.data.normalizer import Normalizer
from gan_mpc_tpu.envs import PendulumSwingup
from gan_mpc_tpu.models import (
    CostFeatureNet,
    ExpertPredictor,
    LearnedDynamics,
    MPCCost,
    ResidualMLPDynamicsNet,
)
from gan_mpc_tpu.parallel import (
    make_mesh,
    make_sharded_collect,
    make_sharded_cost_step,
    make_sharded_dynamics_step,
    shard_batch,
)
from gan_mpc_tpu.planner import SolverSettings
from gan_mpc_tpu.policies import MPCPolicy
from gan_mpc_tpu.policies.losses import l2_imitation_loss
from gan_mpc_tpu.training.masking import masked_adam

X, U, H = 3, 1, 3
KEY = jax.random.PRNGKey(0)


def _tiny_policy():
    return MPCPolicy(
        cost_model=MPCCost(CostFeatureNet(hidden=(16,), features_out=4), H),
        dynamics_model=LearnedDynamics(
            ResidualMLPDynamicsNet(x_size=X, hidden=(16,))
        ),
        expert_model=ExpertPredictor(
            x_size=X, u_size=U, arch="mlp", features=0, hidden=(16,)
        ),
        horizon=H,
        settings=SolverSettings(max_iterations=5),
    )


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh()


def test_mesh_has_eight_devices(mesh):
    assert mesh.devices.shape == (8,)


def test_sharded_cost_step_matches_single_device(mesh):
    policy = _tiny_policy()
    params = policy.init(KEY, (-2.0, 3.0, -3.0), U)
    opt, opt_state = masked_adam(
        params, ["dynamics_params", "expert_params"], 1e-4
    )
    batch = 16
    Xb = 0.1 * jax.random.normal(KEY, (batch, 2, X))
    Yb = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (batch, H + 1, X))

    # single-device reference
    loss_ref, grads_ref = policy.batched_loss_and_grad(
        params, Xb, l2_imitation_loss, (Yb,)
    )

    step = make_sharded_cost_step(policy, opt, mesh, l2_imitation_loss)
    p2, _, loss_sh = step(
        params, opt_state, *shard_batch((Xb, Yb), mesh)
    )
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-4)
    # params moved only in cost components
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        params["dynamics_params"],
        p2["dynamics_params"],
    )
    assert max(jax.tree_util.tree_leaves(d)) == 0.0
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        params["cost_params"],
        p2["cost_params"],
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0.0


def test_sharded_dynamics_step_matches_single_device(mesh):
    policy = _tiny_policy()
    params = policy.init(KEY, (-2.0, 3.0, -3.0), U)
    opt, opt_state = masked_adam(
        params, ["mpc_weights", "cost_params", "expert_params"], 1e-3
    )
    batch = 32
    k1, k2, k3 = jax.random.split(KEY, 3)
    Xb = jax.random.normal(k1, (batch, H, X))
    Ub = jax.random.normal(k2, (batch, H, U))
    Yb = jax.random.normal(k3, (batch, H, X))

    step = make_sharded_dynamics_step(
        policy.dynamics_model, opt, mesh, gamma=0.9
    )
    p2, _, loss = step(
        params,
        opt_state,
        *shard_batch((Xb, Ub, Yb), mesh),
        jnp.asarray(True),
    )
    assert jnp.isfinite(loss)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        params["dynamics_params"],
        p2["dynamics_params"],
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


def test_sharded_collect_runs_on_mesh(mesh):
    env = PendulumSwingup()
    p = env.default_params()
    norm = Normalizer.identity(env.obs_size, env.act_size)

    def policy_fn(params, hx, hu):
        del params
        return -0.3 * hx[-1, 2:3]

    collect = make_sharded_collect(
        env, p, policy_fn, norm, mesh, num_steps=20, history=1,
        envs_per_device=2,
    )
    keys = jax.random.split(KEY, 16)
    ep = collect(None, shard_batch(keys, mesh))
    assert ep.states.shape == (16, 20, 3)
    assert bool(jnp.all(jnp.isfinite(ep.rewards)))


def test_dp_tp_dynamics_step_matches_single_device():
    """The hybrid DP x TP training step (batch over 'dp', MLP hidden axes
    over 'tp', GSPMD collectives) must reproduce the plain single-device
    update to fp tolerance — the production TP path for wide ensemble
    stacks (BENCHMARKS.md TP note)."""
    import optax

    from gan_mpc_tpu.parallel import make_dp_tp_dynamics_step
    from gan_mpc_tpu.parallel.mesh import make_mesh
    from gan_mpc_tpu.training.dynamics import multistep_prediction_loss

    mesh = make_mesh(8, axis_names=("dp", "tp"), shape=(4, 2))
    dyn = LearnedDynamics(
        ResidualMLPDynamicsNet(x_size=X, hidden=(64, 64))
    )
    params = {"dynamics_params": dyn.init(KEY, U)}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    B, T = 8, 4
    k1, k2, k3 = jax.random.split(KEY, 3)
    Xw = jax.random.normal(k1, (B, T, X))
    Uw = jax.random.normal(k2, (B, T, U))
    Yw = jax.random.normal(k3, (B, T, X))

    def single_step(params, opt_state):
        def loss_fn(params):
            losses = jax.vmap(
                lambda x, u, y: multistep_prediction_loss(
                    dyn, params["dynamics_params"], x, u, y, 0.9,
                    jnp.asarray(True),
                )
            )(Xw, Uw, Yw)
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    want_params, want_loss = single_step(params, opt_state)
    step = make_dp_tp_dynamics_step(dyn, opt, mesh, gamma=0.9)
    got_params, _, got_loss = step(
        params, opt_state, Xw, Uw, Yw, jnp.asarray(True)
    )
    np.testing.assert_allclose(
        float(got_loss), float(want_loss), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(got_params),
        jax.tree_util.tree_leaves(want_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        )


def test_tensor_parallel_param_sharding_matches_replicated():
    """pjit-style TP: kernels sharded on the hidden axis over an 8-way
    'tp' mesh must produce identical results to replicated execution."""
    from gan_mpc_tpu.parallel.mesh import apply_tensor_parallel, make_mesh

    mesh = make_mesh(8, axis_names=("tp",))
    net = ResidualMLPDynamicsNet(x_size=X, hidden=(64, 64))
    dyn = LearnedDynamics(net)
    params = dyn.init(KEY, U)
    xc = jax.random.normal(KEY, (X,))
    u = jnp.ones((U,))
    expected = dyn(xc, u, 0, params)
    tp_params = apply_tensor_parallel(params, mesh)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda p: dyn(xc, u, 0, p))(tp_params)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=1e-5
    )
