from gan_mpc_tpu.data.buffers import ReplayBuffer  # noqa: F401
from gan_mpc_tpu.data.normalizer import Normalizer  # noqa: F401
from gan_mpc_tpu.data.trajectories import (  # noqa: F401
    TrajectorySet,
    load_trajectories,
    save_trajectories,
)
from gan_mpc_tpu.data.windows import (  # noqa: F401
    cost_windows,
    sequence_windows,
    shuffle_and_split,
)
