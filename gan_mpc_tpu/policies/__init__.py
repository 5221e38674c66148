from gan_mpc_tpu.policies.mpc import MPCPolicy  # noqa: F401
from gan_mpc_tpu.policies.losses import (  # noqa: F401
    critic_bce_loss,
    gan_generator_loss,
    l2_imitation_loss,
)
