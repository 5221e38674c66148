"""Torque-limited pendulum swingup (pure JAX).

Task-equivalent to dm_control's ``pendulum_swingup`` (the reference's
default env, ``/root/reference/config/gan_hyperparameters.yaml:8``):
observation [cos th, sin th, th_dot] (3,), one bounded torque actuator,
reward 1 while the pole is within 8 degrees of vertical, 1000-step
episodes at dt = 0.02, and the actuator is weak enough that swingup
requires energy pumping.

th = 0 is upright. The pole is a uniform rod of length L pivoting at one
end: inertia = m L^2 / 3, COM at L / 2.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from gan_mpc_tpu.envs import base

# Pure-Python so importing this module never initializes a JAX backend
# (the driver's dryrun must be able to force a CPU backend first).
_COS_BOUND = math.cos(math.radians(8.0))


class PendulumParams(struct.PyTreeNode):
    body_mass_pole: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.0))
    geom_size_pole: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.0))  # rod length L
    gravity: jax.Array = struct.field(default_factory=lambda: jnp.float32(9.81))
    damping: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.1))
    torque_gain: jax.Array = struct.field(default_factory=lambda: jnp.float32(2.0))


class PendulumSwingup:
    obs_size = 3
    act_size = 1
    dt = 0.02
    episode_steps = 1000
    name = "pendulum_swingup"

    def default_params(self) -> PendulumParams:
        return PendulumParams()

    def reset(self, params: PendulumParams, key: jax.Array) -> base.EnvState:
        # Start hanging near the bottom with small noise (as the suite's
        # swingup task randomizes the initial pole angle around down).
        k1, k2 = jax.random.split(key)
        th = jnp.pi + 0.1 * jax.random.normal(k1, ())
        thd = 0.02 * jax.random.normal(k2, ())
        return base.EnvState(
            qpos=jnp.array([th], dtype=jnp.float32),
            qvel=jnp.array([thd], dtype=jnp.float32),
            t=jnp.int32(0),
        )

    def step(self, params: PendulumParams, state: base.EnvState, action):
        u = jnp.clip(action, -1.0, 1.0)[0]
        th, thd = state.qpos[0], state.qvel[0]
        m, length = params.body_mass_pole, params.geom_size_pole
        inertia = m * length**2 / 3.0
        torque = (
            params.torque_gain * u
            + m * params.gravity * (length / 2.0) * jnp.sin(th)
            - params.damping * thd
        )
        th, thd = base.semi_implicit_euler(th, thd, torque / inertia, self.dt)
        new_state = base.EnvState(
            qpos=jnp.array([th]), qvel=jnp.array([thd]), t=state.t + 1
        )
        reward = base.tolerance(jnp.cos(th), lower=_COS_BOUND, upper=1.0)
        return new_state, reward

    def observe(self, params: PendulumParams, state: base.EnvState):
        th = state.qpos[0]
        return jnp.array([jnp.cos(th), jnp.sin(th), state.qvel[0]])
