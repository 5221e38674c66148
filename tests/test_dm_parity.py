"""dm_control-as-oracle parity tests (SURVEY.md §4).

The reference runs on dm_control/MuJoCo; these tests verify the pure-JAX
envs against the real suite: step-level physics fidelity and cross-env
policy transfer. Skipped when dm_control is not installed (it is an
optional oracle, not a dependency).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

dm_suite = pytest.importorskip("dm_control.suite")

from gan_mpc_tpu.data.normalizer import Normalizer
from gan_mpc_tpu.envs import make_env
from gan_mpc_tpu.envs.dm_eval import (
    evaluate_in_dm_control,
    flatten_observation,
)
from gan_mpc_tpu.runners.collect import scripted_expert

KEY = jax.random.PRNGKey(0)


def test_pendulum_step_is_bit_exact_to_mujoco():
    """200 random-action steps from a known state: the pure-JAX pendulum
    must track MuJoCo at machine precision (same point-mass model, same
    implicit-damping Euler integration)."""
    env = make_env("pendulum_swingup")
    dm_env = dm_suite.load("pendulum", "swingup")

    rng = np.random.RandomState(0)
    acts = rng.uniform(-1, 1, size=(200, 1))
    th0, thd0 = np.pi - 0.3, 0.1
    with dm_env.physics.reset_context():
        dm_env.physics.named.data.qpos["hinge"] = th0
        dm_env.physics.named.data.qvel["hinge"] = thd0

    from gan_mpc_tpu.envs.base import EnvState

    # float64 so the comparison tests the MODEL, not float32 rounding
    jax.config.update("jax_enable_x64", True)
    try:
        p = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float64), env.default_params()
        )
        s = EnvState(
            qpos=jnp.array([th0], jnp.float64),
            qvel=jnp.array([thd0], jnp.float64),
            t=jnp.int32(0),
        )
        step = jax.jit(env.step)
        max_dth = max_dthd = 0.0
        for t in range(200):
            dm_env.physics.set_control(acts[t])
            dm_env.physics.step()
            s, _ = step(p, s, jnp.asarray(acts[t]))
            dm_th = float(dm_env.physics.named.data.qpos["hinge"][0])
            dm_thd = float(dm_env.physics.named.data.qvel["hinge"][0])
            dth = abs(
                ((float(s.qpos[0]) - dm_th + np.pi) % (2 * np.pi)) - np.pi
            )
            max_dth = max(max_dth, dth)
            max_dthd = max(max_dthd, abs(float(s.qvel[0]) - dm_thd))
    finally:
        jax.config.update("jax_enable_x64", False)
    # Residual is sin/cos ulp differences (XLA vs MuJoCo's libm)
    # compounded through 200 chaotic steps; a MODEL error — wrong
    # inertia, gain, damping, or integrator — diverges to >1e-2 here
    # (e.g. the round-1 rod model reaches O(1) within 50 steps).
    assert max_dth < 1e-5, max_dth
    assert max_dthd < 1e-4, max_dthd


def test_pendulum_reward_matches_dm_control():
    env = make_env("pendulum_swingup")
    dm_env = dm_suite.load("pendulum", "swingup")
    from gan_mpc_tpu.envs.base import EnvState

    for th in (0.0, 0.1, 0.14, 0.5, np.pi):
        with dm_env.physics.reset_context():
            dm_env.physics.named.data.qpos["hinge"] = th
        dm_r = dm_env.task.get_reward(dm_env.physics)
        from gan_mpc_tpu.envs.base import tolerance
        from gan_mpc_tpu.envs.pendulum import _COS_BOUND

        mine = float(tolerance(jnp.cos(th), lower=_COS_BOUND, upper=1.0))
        np.testing.assert_allclose(mine, float(dm_r), atol=1e-6)


def test_cartpole_step_matches_mujoco():
    """300 random-action RK4 steps: the pure-JAX cartpole must track
    MuJoCo (cartpole.xml sets integrator=RK4, unlike pendulum)."""
    env = make_env("cartpole_balance")
    dm_env = dm_suite.load("cartpole", "balance")
    from gan_mpc_tpu.envs.base import EnvState

    rng = np.random.RandomState(0)
    acts = rng.uniform(-1, 1, size=(300, 1))
    with dm_env.physics.reset_context():
        dm_env.physics.named.data.qpos["slider"] = 0.05
        dm_env.physics.named.data.qpos["hinge_1"] = 0.3
        dm_env.physics.named.data.qvel[:] = [-0.1, 0.2]

    jax.config.update("jax_enable_x64", True)
    try:
        p = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float64), env.default_params()
        )
        s = EnvState(
            qpos=jnp.array([0.05, 0.3], jnp.float64),
            qvel=jnp.array([-0.1, 0.2], jnp.float64),
            t=jnp.int32(0),
        )
        step = jax.jit(env.step)
        md = np.zeros(4)
        r = None
        for t in range(300):
            dm_env.physics.set_control(acts[t])
            dm_env.physics.step()
            s, r = step(p, s, jnp.asarray(acts[t]))
            dmq = np.concatenate(
                [dm_env.physics.data.qpos, dm_env.physics.data.qvel]
            )
            mine = np.concatenate([np.asarray(s.qpos), np.asarray(s.qvel)])
            md = np.maximum(md, np.abs(dmq - mine))
    finally:
        jax.config.update("jax_enable_x64", False)
    assert md.max() < 1e-4, md  # ulp drift only; model errors blow past 1e-2
    np.testing.assert_allclose(
        float(r), float(dm_env.task.get_reward(dm_env.physics)), atol=1e-5
    )


def test_cartpole_expert_transfers_to_real_dm_control():
    env = make_env("cartpole_balance")
    policy = scripted_expert(env)
    norm = Normalizer.identity(env.obs_size, env.act_size)
    mean_ret, rets = evaluate_in_dm_control(
        "cartpole_balance",
        lambda params, hx, hu: policy(params, hx, hu),
        None,
        norm,
        num_episodes=2,
    )
    assert mean_ret > 990.0, rets


def test_scripted_expert_transfers_to_real_dm_control():
    """The energy-pumping expert trained against the pure-JAX env must
    score comparably inside actual MuJoCo — the end-to-end evidence that
    the env is the same task (clears the reference's >500 expert gate,
    /root/reference/data_loader.py:25-27)."""
    env = make_env("pendulum_swingup")
    policy = scripted_expert(env)
    norm = Normalizer.identity(env.obs_size, env.act_size)
    mean_ret, rets = evaluate_in_dm_control(
        "pendulum_swingup",
        lambda params, hx, hu: policy(params, hx, hu),
        None,
        norm,
        history=1,
        num_episodes=3,
        max_steps=1000,
    )
    assert mean_ret > 500.0, rets


def test_cheetah_gait_expert_transfers_to_real_dm_control():
    """The open-loop CPG gait evolved on the planar cheetah must also run
    forward inside actual MuJoCo — quantifying the planar model's task
    fidelity. Measured (2026-08, 1000 steps): ~102 on the planar env,
    ~67 in real dm_control (same 0.01 s control step) — the gait carries
    ~2/3 of its speed across; same qpos layout ([z, pitch, 6 joints] +
    9 qvel) on both sides."""
    from gan_mpc_tpu.runners.collect import cheetah_gait_action

    env = dm_suite.load("cheetah", "run", task_kwargs={"random": 0})
    assert abs(env.control_timestep() - 0.01) < 1e-9
    ts = env.reset()
    total = 0.0
    gait = jax.jit(lambda t: cheetah_gait_action(t, 0.01))
    for t in range(1000):
        ts = env.step(np.asarray(gait(jnp.float32(t)), np.float64))
        total += float(ts.reward or 0.0)
    assert total > 40.0, total  # forward locomotion, not flailing


def test_walker_expert_divergence_documented():
    """The planar walker is task-equivalent, NOT dm-exact: its morphology
    (stiffness-driven 7-link chain, different masses/lengths) diverges
    from the suite walker, and the scripted balance expert does not
    transfer. Measured (2026-08, 1000 steps): ~263 on the planar env vs
    ~11 in real dm_control through the state adapter. This test pins the
    adapter's mechanics (layout permutation) and the measured divergence
    so the gap is tracked, matching the documented task-equivalence
    claim."""
    from gan_mpc_tpu.envs import make_env
    from gan_mpc_tpu.envs.dm_eval import _walker_obs
    from gan_mpc_tpu.runners.collect import scripted_expert

    env = dm_suite.load("walker", "walk", task_kwargs={"random": 0})
    ts = env.reset()
    obs = _walker_obs(env.physics)
    assert obs.shape == (17,)
    # height lands where the planar layout expects it (obs[0] = rootz)
    np.testing.assert_allclose(
        obs[0], float(env.physics.named.data.qpos["rootz"])
    )
    e = make_env("walker_walk")
    pol = jax.jit(scripted_expert(e))
    total = 0.0
    for _ in range(300):
        u = pol(
            None,
            jnp.asarray(obs, jnp.float32)[None].repeat(2, 0),
            jnp.zeros((1, 6)),
        )
        ts = env.step(np.asarray(u, np.float64))
        total += float(ts.reward or 0.0)
        obs = _walker_obs(env.physics)
    # documented divergence: the controller keeps the suite walker from
    # instantly collapsing (nonzero reward) but does NOT walk it
    assert 0.0 < total < 150.0, total


def test_suite_physics_shift_multiplies_named_model_entries():
    """apply_suite_physics_shift reproduces the reference's imitator
    domain shift on a real suite env (/root/reference/utils.py:43-62)."""
    from gan_mpc_tpu.envs.dm_eval import apply_suite_physics_shift

    env = dm_suite.load("cheetah", "run")
    before = float(env.physics.named.model.body_mass["torso"])
    apply_suite_physics_shift(env, [{"key": "body_mass_torso", "value": 3.0}])
    after = float(env.physics.named.model.body_mass["torso"])
    np.testing.assert_allclose(after, 3.0 * before)
    with pytest.raises(ValueError):
        apply_suite_physics_shift(env, [{"key": "gravity_x", "value": 2.0}])


def test_dm_eval_rejects_planar_humanoid():
    from gan_mpc_tpu.envs.dm_eval import has_dm_counterpart

    assert not has_dm_counterpart("humanoid_stand")
    assert has_dm_counterpart("walker_walk")
    norm = Normalizer.identity(29, 12)
    with pytest.raises(ValueError, match="planar"):
        evaluate_in_dm_control(
            "humanoid_stand", lambda p, hx, hu: None, None, norm,
            num_episodes=1,
        )


def test_observation_flattening_matches_reference_layout():
    dm_env = dm_suite.load("pendulum", "swingup")
    ts = dm_env.reset()
    flat = flatten_observation(ts.observation)
    assert flat.shape == (3,)  # [cos, sin, thd]
    np.testing.assert_allclose(
        flat[:2], np.asarray(ts.observation["orientation"])
    )
