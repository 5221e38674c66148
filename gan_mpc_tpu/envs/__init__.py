from gan_mpc_tpu.envs.base import (  # noqa: F401
    EnvState,
    apply_physics_shift,
    tolerance,
)
from gan_mpc_tpu.envs.cartpole import CartpoleBalance  # noqa: F401
from gan_mpc_tpu.envs.pendulum import PendulumSwingup  # noqa: F401


def make_env(name: str):
    """Environment factory by dm_control-style '{domain}_{task}' name."""
    if name == "pendulum_swingup":
        return PendulumSwingup()
    if name == "cartpole_balance":
        return CartpoleBalance()
    if name == "cheetah_run":
        from gan_mpc_tpu.envs.cheetah import CheetahRun

        return CheetahRun()
    if name == "walker_walk":
        from gan_mpc_tpu.envs.walker import WalkerWalk

        return WalkerWalk()
    if name == "humanoid_stand":
        from gan_mpc_tpu.envs.humanoid import HumanoidStand

        return HumanoidStand()
    if name == "humanoid_walk":
        from gan_mpc_tpu.envs.humanoid import HumanoidWalk

        return HumanoidWalk()
    raise ValueError(f"unknown environment {name!r}")
