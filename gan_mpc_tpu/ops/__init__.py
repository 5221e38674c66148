from gan_mpc_tpu.ops.fused_mlp import fused_mlp, mlp_params  # noqa: F401
from gan_mpc_tpu.ops.fused_lstm import fused_lstm, lstm_params  # noqa: F401
