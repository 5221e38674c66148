"""Cart-pole balance (pure JAX).

Task-equivalent to dm_control's ``cartpole_balance`` (present in the
reference configs, ``/root/reference/config/l2_hyperparameters.yaml:7``):
observation [cart_x, cos th, sin th, cart_xd, th_d] (5,), one bounded
slide actuator, dense shaped reward (upright x centered x small-control x
small-velocity), 1000-step episodes.

th = 0 is upright. Standard cart-pole equations (pole = uniform rod).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gan_mpc_tpu.envs import base


class CartpoleParams(struct.PyTreeNode):
    body_mass_cart: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.0))
    body_mass_pole_1: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.1))
    geom_size_pole_1: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.0))
    geom_size_cart: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.2))
    gravity: jax.Array = struct.field(default_factory=lambda: jnp.float32(9.81))
    force_gain: jax.Array = struct.field(default_factory=lambda: jnp.float32(10.0))
    damping: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.01))


class CartpoleBalance:
    obs_size = 5
    act_size = 1
    dt = 0.02
    episode_steps = 1000
    name = "cartpole_balance"

    def default_params(self) -> CartpoleParams:
        return CartpoleParams()

    def reset(self, params: CartpoleParams, key: jax.Array) -> base.EnvState:
        # Balance task: start near upright with small perturbations.
        k1, k2 = jax.random.split(key)
        qpos = 0.03 * jax.random.normal(k1, (2,))  # [cart_x, th]
        qvel = 0.01 * jax.random.normal(k2, (2,))
        return base.EnvState(
            qpos=qpos.astype(jnp.float32),
            qvel=qvel.astype(jnp.float32),
            t=jnp.int32(0),
        )

    def step(self, params: CartpoleParams, state: base.EnvState, action):
        u = jnp.clip(action, -1.0, 1.0)[0]
        x, th = state.qpos
        xd, thd = state.qvel
        mc, mp = params.body_mass_cart, params.body_mass_pole_1
        length = params.geom_size_pole_1
        lc = length / 2.0  # COM of uniform rod
        g = params.gravity
        force = params.force_gain * u - params.damping * xd

        # Canonical cart-pole equations (uniform rod, theta from vertical):
        # thdd = [g sin + cos (-F - mp lc thd^2 sin) / M] /
        #        [lc (4/3 - mp cos^2 / M)]
        # xdd  = [F + mp lc (thd^2 sin - thdd cos)] / M,  M = mc + mp.
        sin, cos = jnp.sin(th), jnp.cos(th)
        total_m = mc + mp
        thdd = (
            g * sin + cos * (-force - mp * lc * thd**2 * sin) / total_m
        ) / (lc * (4.0 / 3.0 - mp * cos**2 / total_m))
        xdd = (force + mp * lc * (thd**2 * sin - thdd * cos)) / total_m

        qpos, qvel = base.semi_implicit_euler(
            state.qpos, state.qvel, jnp.array([xdd, thdd]), self.dt
        )
        new_state = base.EnvState(qpos=qpos, qvel=qvel, t=state.t + 1)

        upright = (jnp.cos(qpos[1]) + 1.0) / 2.0
        centered = (1.0 + base.tolerance(qpos[0], margin=2.0)) / 2.0
        small_control = (
            4.0
            + base.tolerance(
                u, margin=1.0, value_at_margin=0.0, sigmoid="quadratic"
            )
        ) / 5.0
        small_velocity = (1.0 + base.tolerance(qvel[1], margin=5.0)) / 2.0
        reward = upright * centered * small_control * small_velocity
        return new_state, reward

    def observe(self, params: CartpoleParams, state: base.EnvState):
        x, th = state.qpos
        return jnp.array([x, jnp.cos(th), jnp.sin(th), state.qvel[0], state.qvel[1]])
