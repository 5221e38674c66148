"""Shape/dtype/semantics tests for the model zoo (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_mpc_tpu.models import (
    CostFeatureNet,
    ExpertPredictor,
    LearnedDynamics,
    LSTMDynamicsNet,
    MPCCost,
    ResidualMLPDynamicsNet,
    SequenceCritic,
)

X, U, H = 3, 1, 5
KEY = jax.random.PRNGKey(0)


def test_cost_terminal_vs_staging():
    net = CostFeatureNet(hidden=(16, 16), features_out=4)
    cost = MPCCost(net, horizon=H)
    params = cost.init(KEY, X)
    w = jnp.array([-2.0, 3.0, -3.0])
    goal_X = jnp.zeros((H + 1, X))
    xc, u = jnp.ones((X,)), jnp.ones((U,))
    stage = cost(xc, u, 0, params, w, goal_X)
    term = cost(xc, jnp.zeros((U,)), H, params, w, goal_X)
    assert stage.shape == () and term.shape == ()
    # terminal cost is w_sig[2] * <f, f> >= 0
    assert float(term) >= 0.0
    # staging cost at goal with zero action ~ 0
    near0 = cost(jnp.zeros((X,)), jnp.zeros((U,)), 0, params, w, goal_X)
    assert abs(float(near0)) < 1e-6


def test_cost_nn_nonnegative():
    net = CostFeatureNet(hidden=(16,), features_out=4)
    params = net.init(KEY, jnp.zeros((X,)))
    for i in range(10):
        xc = jax.random.normal(jax.random.PRNGKey(i), (X,))
        assert float(net.apply(params, xc)) >= 0.0


def test_mlp_dynamics_residual_and_carryfree():
    net = ResidualMLPDynamicsNet(x_size=X, hidden=(32, 32))
    dyn = LearnedDynamics(net)
    params = dyn.init(KEY, U)
    xc = jax.random.normal(KEY, (X,))
    nxt = dyn(xc, jnp.zeros((U,)), 0, params)
    assert nxt.shape == (X,)
    assert dyn.carry_size == 0
    assert dyn.zero_carry().shape == (0,)


def test_lstm_dynamics_carry_packed_in_state():
    net = LSTMDynamicsNet(x_size=X, features=8, hidden=(16,))
    dyn = LearnedDynamics(net)
    params = dyn.init(KEY, U)
    assert dyn.carry_size == 16
    xc = jnp.concatenate([jax.random.normal(KEY, (X,)), dyn.zero_carry()])
    nxt = dyn(xc, jnp.ones((U,)), 0, params)
    assert nxt.shape == (X + 16,)
    # carry must actually evolve
    assert float(jnp.abs(nxt[X:]).sum()) > 0.0


def test_dynamics_history_warm_carry():
    net = LSTMDynamicsNet(x_size=X, features=8, hidden=(16,))
    dyn = LearnedDynamics(net)
    params = dyn.init(KEY, U)
    hx = jax.random.normal(KEY, (4, X))
    hu = jax.random.normal(jax.random.PRNGKey(1), (4, U))
    carry = dyn.warm_carry(params, hx, hu)
    assert carry.shape == (16,)
    # manual replay must agree
    c = dyn.zero_carry()
    for i in range(4):
        xc = jnp.concatenate([hx[i], c])
        c = dyn(xc, hu[i], 0, params)[X:]
    np.testing.assert_allclose(np.asarray(carry), np.asarray(c), atol=1e-6)


def test_critic_scalar_score():
    critic = SequenceCritic(features=8, hidden=(16,))
    params = critic.init_params(KEY, X)
    xseq = jax.random.normal(KEY, (H + 1, X))
    score = critic.apply(params, xseq)
    assert score.shape == ()
    scores = jax.vmap(lambda s: critic.apply(params, s))(
        jnp.stack([xseq, -xseq])
    )
    assert scores.shape == (2,)


def _make_expert(arch):
    return ExpertPredictor(
        x_size=X, u_size=U, arch=arch, features=8, hidden=(16,)
    )


def test_expert_shapes_and_bounds():
    for arch in ("mlp", "lstm"):
        model = _make_expert(arch)
        params = model.init_params(KEY)
        carry = model.init_carry(jnp.zeros((X,)))
        xseq = jax.random.normal(KEY, (6, X))
        carry, (nxt, us) = model.apply(params, carry, xseq, True)
        assert nxt.shape == (6, X) and us.shape == (6, U)
        assert bool(jnp.all(jnp.abs(us) <= 1.0))  # tanh-squashed


def test_expert_teacher_forcing_switch():
    model = _make_expert("lstm")
    params = model.init_params(KEY)
    xseq = jax.random.normal(KEY, (6, X))
    carry = model.init_carry(xseq[0])
    _, (tf_out, _) = model.apply(params, carry, xseq, True)
    _, (ar_out, _) = model.apply(params, carry, xseq, False)
    # First step identical (x_prev == xseq[0]); later steps diverge.
    np.testing.assert_allclose(
        np.asarray(tf_out[0]), np.asarray(ar_out[0]), atol=1e-6
    )
    assert float(jnp.abs(tf_out[-1] - ar_out[-1]).max()) > 1e-6


def test_expert_plan_time_generation():
    for arch in ("mlp", "lstm"):
        model = _make_expert(arch)
        params = model.init_params(KEY)
        history = jax.random.normal(KEY, (3, X))  # history + current
        carry = model.warm_carry(params, history)
        goal_xseq, useq = model.generate(params, carry, H)
        assert goal_xseq.shape == (H + 1, X)
        assert useq.shape == (H, U)
        np.testing.assert_allclose(
            np.asarray(goal_xseq[0]), np.asarray(history[-1]), atol=1e-6
        )


def test_expert_generation_is_deterministic():
    model = _make_expert("lstm")
    params = model.init_params(KEY)
    history = jax.random.normal(KEY, (3, X))
    carry = model.warm_carry(params, history)
    a = model.generate(params, carry, H)
    b = model.generate(params, carry, H)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
