"""Humanoid env (BASELINE configs[4]'s real humanoid-scale task)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_mpc_tpu.envs import make_env
from gan_mpc_tpu.envs.base import apply_physics_shift
from gan_mpc_tpu.runners.collect import scripted_expert

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("name", ["humanoid_stand", "humanoid_walk"])
def test_env_api_and_shapes(name):
    env = make_env(name)
    assert env.obs_size == 29 and env.act_size == 12
    params = env.default_params()
    state = env.reset(params, KEY)
    assert state.qpos.shape == (15,) and state.qvel.shape == (15,)
    obs = env.observe(params, state)
    assert obs.shape == (env.obs_size,)
    state2, reward = env.step(params, state, jnp.zeros((env.act_size,)))
    assert jnp.isfinite(reward)
    assert 0.0 <= float(reward) <= 1.0
    assert int(state2.t) == 1


def test_reward_shaping_prefers_standing():
    env = make_env("humanoid_stand")
    p = env.default_params()
    up = env.reset(p, KEY)
    fallen = up.replace(
        qpos=up.qpos.at[1].set(0.2).at[2].set(1.5),
    )
    _, r_up = env.step(p, up, jnp.zeros((12,)))
    _, r_fallen = env.step(p, fallen, jnp.zeros((12,)))
    assert float(r_up) > 0.5 > float(r_fallen)


def test_physics_shift_fields():
    env = make_env("humanoid_stand")
    p = env.default_params()
    p2 = apply_physics_shift(
        p, [{"key": "body_mass_torso", "value": 1.5}]
    )
    np.testing.assert_allclose(float(p2.body_mass_torso), 18.0)


def test_fallen_body_rests_on_ground():
    """Passive drop: the body must settle on the ground plane, not sink
    through it or blow up (contact + integrator stability)."""
    env = make_env("humanoid_stand")
    p = env.default_params()
    s = env.reset(p, KEY)
    s = s.replace(qpos=s.qpos.at[2].set(0.9))  # strong initial lean

    def body(s, _):
        s, r = env.step(p, s, jnp.zeros((12,)))
        return s, s.qpos[1]

    s, zs = jax.lax.scan(body, s, None, length=400)
    assert bool(jnp.all(jnp.isfinite(s.qpos)))
    assert float(zs[-1]) > -0.5  # settled near the ground, not through it
    assert float(jnp.abs(s.qvel).max()) < 20.0


def test_scripted_stand_expert_balances():
    """The tuned stand expert must hold the humanoid up (this is the
    expert that feeds humanoid imitation training)."""
    env = make_env("humanoid_stand")
    p = env.default_params()
    pol = scripted_expert(env)

    def body(s, _):
        obs = env.observe(p, s)
        s, r = env.step(p, s, pol(None, obs[None], None))
        return s, (r, obs)

    s0 = env.reset(p, KEY)
    s, (rs, _) = jax.lax.scan(body, s0, None, length=300)
    assert float(jnp.mean(rs)) > 0.5
    # still upright at the end
    assert float(env._head_height(s.qpos)) > 1.2


def test_scripted_walk_expert_walks():
    """The state-indexed walk expert (expert v3: phase from pose
    matching, runners/collect.py) must actually walk — it feeds
    humanoid_walk imitation AND its DAgger corrective labels."""
    env = make_env("humanoid_walk")
    p = env.default_params()
    pol = scripted_expert(env)

    def body(s, _):
        obs = env.observe(p, s)
        s, r = env.step(p, s, pol(None, obs[None], None))
        return s, r

    s0 = env.reset(p, KEY)
    s, rs = jax.lax.scan(body, s0, None, length=400)
    assert bool(jnp.all(jnp.isfinite(s.qpos)))
    assert float(jnp.mean(rs)) > 0.4  # walk reward flowing, not fallen
    assert float(s.qpos[0]) > 1.0  # real forward displacement


def test_humanoid_renderer():
    from gan_mpc_tpu.utils.video import render_episode

    env = make_env("humanoid_stand")
    p = env.default_params()
    s = env.reset(p, KEY)
    frames = render_episode(
        "humanoid_stand", np.asarray(s.qpos)[None].repeat(2, 0)
    )
    assert frames.shape[0] == 2 and frames.shape[-1] == 3
