from gan_mpc_tpu.ops.fused_mlp import fused_mlp, mlp_params  # noqa: F401
