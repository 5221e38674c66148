"""Cheetah env + planar physics engine tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_mpc_tpu.envs import apply_physics_shift, make_env
from gan_mpc_tpu.envs import planar
from gan_mpc_tpu.envs.cheetah import CheetahRun

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def env():
    return CheetahRun()


@functools.partial(jax.jit, static_argnums=(0, 3))
def _rollout(env, params, s, n, u_scale=0.0, key=KEY):
    def body(carry, k):
        s = carry
        u = u_scale * jax.random.uniform(k, (6,), minval=-1, maxval=1)
        s, r = env.step(params, s, u)
        return s, (s.qpos, s.qvel, r)

    return jax.lax.scan(body, s, jax.random.split(key, n))


def test_factory_and_spec(env):
    assert make_env("cheetah_run").name == "cheetah_run"
    p = env.default_params()
    s = env.reset(p, KEY)
    obs = env.observe(p, s)
    assert obs.shape == (17,)
    assert env.act_size == 6


def test_mass_matrix_properties(env):
    model = env._model(env.default_params())
    q = jax.random.normal(KEY, (9,)) * 0.1
    M = planar.mass_matrix(model, q)
    assert M.shape == (9, 9)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M.T), atol=1e-5)
    w = np.linalg.eigvalsh(np.asarray(M))
    assert w.min() > 0.0  # positive definite
    # total mass appears in the x-translation diagonal entry
    np.testing.assert_allclose(
        float(M[0, 0]), float(model.mass.sum()), rtol=1e-5
    )


def test_drop_settles_without_blowup(env):
    p = env.default_params()
    s = env.reset(p, KEY)
    _, (qpos, qvel, _) = _rollout(env, p, s, 600)
    assert bool(jnp.all(jnp.isfinite(qpos)))
    # ends at rest above ground, below start height
    assert 0.05 < float(qpos[-1, 1]) < 0.7
    assert float(jnp.abs(qvel[-1]).max()) < 2.0


def test_random_actions_stay_finite(env):
    p = env.default_params()
    s = env.reset(p, KEY)
    _, (qpos, qvel, r) = _rollout(env, p, s, 600, u_scale=1.0)
    assert bool(jnp.all(jnp.isfinite(qpos)))
    assert bool(jnp.all(jnp.isfinite(r)))
    assert bool(jnp.all((r >= 0.0) & (r <= 1.0)))


def test_reward_is_linear_speed_ramp(env):
    p = env.default_params()
    s = env.reset(p, KEY)
    fast = s.replace(qvel=s.qvel.at[0].set(5.0))
    _, r5 = env.step(p, fast, jnp.zeros(6))
    # one step of drag won't move speed far from 5 -> reward ~ 0.5
    assert 0.3 < float(r5) < 0.7


def test_domain_shift_keys(env):
    p = env.default_params()
    p2 = apply_physics_shift(
        p,
        [
            {"key": "body_mass_torso", "value": 2.0},
            {"key": "jnt_stiffness_bfoot", "value": 1.0},
        ],
    )
    np.testing.assert_allclose(float(p2.body_mass_torso), 12.8)
    np.testing.assert_allclose(float(p2.jnt_stiffness_bfoot), 120.0)
    # heavier torso increases the mass matrix
    m1 = planar.mass_matrix(env._model(p), jnp.zeros(9))[0, 0]
    m2 = planar.mass_matrix(env._model(p2), jnp.zeros(9))[0, 0]
    assert float(m2) > float(m1)


def test_gait_expert_moves_forward(env):
    """The v2 CEM-tuned phase-PD expert sustains forward motion under
    the DART collection noise the quality config actually uses
    (gan_cheetah_quality.yaml expert_noise: 0.1). The v1 open-loop CPG
    tolerated sigma 0.25; the closed-loop gait is faster but collapses
    there (measured: 22.9 -> 10.3 over 300 steps), which is why the
    config collects at 0.1."""
    from gan_mpc_tpu.runners.collect import collect_expert_trajectories

    ts = collect_expert_trajectories(
        env, 2, KEY, num_steps=300, noise_sigma=0.1
    )
    assert ts.states.shape == (2, 300, 17)
    # forward velocity: obs = [qpos[1:] (8), qvel (9)] -> qvel[0] is obs[8]
    mean_v = float(ts.states[:, 100:, 8].mean())
    assert mean_v > 0.3
    assert float(ts.rewards.sum(1).mean()) > 12.0


def test_energy_bounded_without_contacts_or_damping():
    """Free-floating chain (no gravity, no damping, no contacts): the
    Lagrangian assembly must conserve energy reasonably well."""
    env = CheetahRun()
    model = env._model(env.default_params())
    model = model._replace(
        gravity=0.0,
        joint_damping=jnp.zeros(7),
        joint_stiffness=jnp.zeros(7),
        ground_kp=0.0,
        ground_kd=0.0,
        limit_kp=0.0,
    )
    q = jnp.zeros(9).at[1].set(5.0)
    qd = 0.5 * jax.random.normal(KEY, (9,))

    def energy(q, qd):
        M = planar.mass_matrix(model, q)
        return 0.5 * qd @ M @ qd

    e0 = float(energy(q, qd))

    @jax.jit
    def roll(q, qd):
        def body(c, _):
            q, qd = c
            q, qd = planar.step(model, q, qd, jnp.zeros(6), 0.01, 4)
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=200)
        return q, qd

    q1, qd1 = roll(q, qd)
    e1 = float(energy(q1, qd1))
    assert abs(e1 - e0) < 0.05 * max(e0, 1e-3)
