"""Pure-JAX environment tests: physics sanity, API, domain shift, jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_mpc_tpu.envs import (
    CartpoleBalance,
    PendulumSwingup,
    apply_physics_shift,
    make_env,
    tolerance,
)
from gan_mpc_tpu.envs.rollout import batched_rollout, episode_rollout
from gan_mpc_tpu.data.normalizer import Normalizer

KEY = jax.random.PRNGKey(0)


def test_tolerance_matches_dm_control_semantics():
    assert float(tolerance(0.5, 0.0, 1.0)) == 1.0
    assert float(tolerance(1.5, 0.0, 1.0)) == 0.0
    # gaussian decay hits value_at_margin exactly at the margin
    v = tolerance(2.0, 0.0, 1.0, margin=1.0, value_at_margin=0.1)
    np.testing.assert_allclose(float(v), 0.1, rtol=1e-4)
    v = tolerance(2.0, 0.0, 1.0, margin=1.0, sigmoid="linear", value_at_margin=0.2)
    np.testing.assert_allclose(float(v), 0.2, rtol=1e-5)


def test_tolerance_gradient_finite_with_inf_upper():
    """Reward gradients through the engine (APG / BPTT experts) must be
    finite: with upper=inf the in-bounds branch's unused d=-inf used to
    leak 0*inf=NaN through jnp.where on the backward pass."""
    for sig in ("gaussian", "linear", "quadratic"):
        g = jax.grad(
            lambda x: tolerance(
                x, lower=1.0, upper=jnp.inf, margin=1.0, sigmoid=sig,
                value_at_margin=0.1 if sig == "gaussian" else 0.0,
            )
        )
        assert jnp.isfinite(g(2.0))   # in bounds (the NaN-leak case)
        assert jnp.isfinite(g(0.5))   # below lower: real decay gradient


@pytest.mark.parametrize("name", ["pendulum_swingup", "cartpole_balance"])
def test_env_api_and_shapes(name):
    env = make_env(name)
    params = env.default_params()
    state = env.reset(params, KEY)
    obs = env.observe(params, state)
    assert obs.shape == (env.obs_size,)
    state2, reward = env.step(params, state, jnp.zeros((env.act_size,)))
    assert jnp.isfinite(reward)
    assert 0.0 <= float(reward) <= 1.0
    assert int(state2.t) == 1


def test_pendulum_energy_conservation_without_damping_or_torque():
    env = PendulumSwingup()
    p = env.default_params().replace(damping=jnp.float32(0.0))
    state = env.reset(p, KEY)

    def energy(s):
        th, thd = s.qpos[0], s.qvel[0]
        inertia = env.inertia(p)
        # potential zero at the bottom (th = pi); COM at distance r
        h = p.geom_size_pole * (1.0 + jnp.cos(th))
        return 0.5 * inertia * thd**2 + p.body_mass_pole * p.gravity * h

    e0 = float(energy(state))

    def step(s, _):
        s, _ = env.step(p, s, jnp.zeros((1,)))
        return s, None

    state_end, _ = jax.lax.scan(step, state, None, length=500)
    e1 = float(energy(state_end))
    # symplectic Euler keeps energy bounded (small drift allowed)
    assert abs(e1 - e0) < 0.15 * max(e0, 1.0)


def test_pendulum_reward_at_top_and_bottom():
    env = PendulumSwingup()
    p = env.default_params()
    up = env.reset(p, KEY).replace(qpos=jnp.array([0.0]), qvel=jnp.array([0.0]))
    down = up.replace(qpos=jnp.array([jnp.pi]))
    _, r_up = env.step(p, up, jnp.zeros((1,)))
    _, r_down = env.step(p, down, jnp.zeros((1,)))
    assert float(r_up) == 1.0
    assert float(r_down) == 0.0


def test_cartpole_balance_reward_high_upright():
    env = CartpoleBalance()
    p = env.default_params()
    s = env.reset(p, KEY)
    _, r = env.step(p, s, jnp.zeros((1,)))
    assert float(r) > 0.8  # starts near upright
    # falling pole ends with low reward
    s_fallen = s.replace(qpos=jnp.array([0.0, jnp.pi]), qvel=jnp.zeros(2))
    _, r2 = env.step(p, s_fallen, jnp.zeros((1,)))
    assert float(r2) < 0.1


def test_cartpole_falls_from_small_perturbation():
    env = CartpoleBalance()
    p = env.default_params()
    s = env.reset(p, KEY).replace(
        qpos=jnp.array([0.0, 0.1]), qvel=jnp.zeros(2)
    )

    def step(s, _):
        s, _ = env.step(p, s, jnp.zeros((1,)))
        return s, s.qpos[1]

    _, angles = jax.lax.scan(step, s, None, length=200)
    # gravity destabilizes upright: the pole must leave the +-0.5 rad cone
    assert float(jnp.abs(angles).max()) > 1.0


def test_physics_shift_named_multipliers():
    env = PendulumSwingup()
    p = env.default_params()
    p2 = apply_physics_shift(p, [{"key": "body_mass_pole", "value": 2.0}])
    np.testing.assert_allclose(float(p2.body_mass_pole), 2.0)
    np.testing.assert_allclose(float(p2.geom_size_pole), 0.5)
    with pytest.raises(ValueError):
        apply_physics_shift(p, [{"key": "body_mass_nonexistent", "value": 2}])
    with pytest.raises(ValueError):
        apply_physics_shift(p, [{"key": "gravity", "value": 2}])


def test_episode_rollout_is_jittable_and_batched():
    env = PendulumSwingup()
    p = env.default_params()
    norm = Normalizer.identity(env.obs_size, env.act_size)

    def policy(params, hist_x, hist_u):
        del params
        return -0.5 * hist_x[-1, 2:3]  # damp velocity

    run = jax.jit(
        lambda k: episode_rollout(env, p, policy, None, norm, k, 50, 1)
    )
    ep = run(KEY)
    assert ep.states.shape == (50, 3)
    assert ep.actions.shape == (50, 1)
    assert ep.rewards.shape == (50,)

    batch = batched_rollout(env, p, policy, None, norm, KEY, 50, 1, 4)
    assert batch.states.shape == (4, 50, 3)
    # different reset keys -> different episodes
    assert float(jnp.abs(batch.states[0] - batch.states[1]).max()) > 1e-4


def test_chunked_rollout_matches_and_is_chunk_invariant():
    """chunked_batched_rollout must match batch_policy_rollout (same
    key layout; fp-tolerance — different XLA fusions) for every chunk
    size, including a remainder chunk (50 % 16 != 0)."""
    from gan_mpc_tpu.envs.rollout import (
        batch_policy_rollout,
        chunked_batched_rollout,
    )

    env = PendulumSwingup()
    p = env.default_params()
    norm = Normalizer.identity(env.obs_size, env.act_size)

    def policy(params, hist_x, hist_u):
        del params
        return -0.5 * hist_x[-1, 2:3]

    ref = batch_policy_rollout(
        env, p,
        lambda prm, hx, hu: jax.vmap(lambda x, u: policy(prm, x, u))(hx, hu),
        None, norm, KEY, 50, 1, 4,
    )
    for chunk in (50, 16, 7):
        got = chunked_batched_rollout(
            env, p, policy, None, norm, KEY, 50, 1, 4, chunk_steps=chunk
        )
        np.testing.assert_allclose(
            np.asarray(got.states), np.asarray(ref.states), atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(got.rewards), np.asarray(ref.rewards), atol=5e-5
        )
