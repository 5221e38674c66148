from gan_mpc_tpu.models.cost import CostFeatureNet, MPCCost  # noqa: F401
from gan_mpc_tpu.models.critic import SequenceCritic  # noqa: F401
from gan_mpc_tpu.models.dynamics import (  # noqa: F401
    LearnedDynamics,
    LSTMDynamicsNet,
    ResidualMLPDynamicsNet,
)
from gan_mpc_tpu.models.expert import ExpertPredictor  # noqa: F401
