from gan_mpc_tpu.planner.ilqr import (  # noqa: F401
    ILQRSolution,
    SolverSettings,
    ilqr,
    rollout,
    total_cost,
)
from gan_mpc_tpu.planner.bilevel import (  # noqa: F401
    make_implicit_planner,
)
