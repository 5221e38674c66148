from gan_mpc_tpu.utils.io import (  # noqa: F401
    load_json,
    load_params,
    new_run_dir,
    save_json,
    save_params,
)
