from gan_mpc_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_axes,
    make_hybrid_mesh,
    make_mesh,
    replicate,
    shard_batch,
)
from gan_mpc_tpu.parallel.sharded import (  # noqa: F401
    make_dp_tp_dynamics_step,
    make_sharded_collect,
    make_sharded_cost_step,
    make_sharded_critic_step,
    make_sharded_dynamics_step,
    make_sharded_ensemble_step,
)
