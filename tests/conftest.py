"""Test harness configuration.

Tests run on CPU with 8 virtual devices so that every mesh/shard_map code
path is exercised without TPU hardware (the standard JAX recipe for testing
multi-device logic; see SURVEY.md §4).

Note: this image pre-imports jax via sitecustomize (axon TPU plugin), so
env vars alone are too late — we must override through jax.config before
any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: the suite is compile-bound (dozens of
# distinct jitted programs); repeat runs load them from disk instead.
from gan_mpc_tpu import runtime_setup  # noqa: E402

runtime_setup.setup(
    os.path.expanduser("~/.cache/gan_mpc_tpu/xla-tests")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
