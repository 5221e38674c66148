from gan_mpc_tpu.training.masking import masked_adam  # noqa: F401
from gan_mpc_tpu.training.common import discounted_sum  # noqa: F401
from gan_mpc_tpu.training.expert import train_expert  # noqa: F401
from gan_mpc_tpu.training.dynamics import (  # noqa: F401
    multistep_prediction_loss,
    train_dynamics,
)
from gan_mpc_tpu.training.cost import train_cost  # noqa: F401
from gan_mpc_tpu.training.critic import (  # noqa: F401
    build_critic_dataset,
    train_critic,
)
