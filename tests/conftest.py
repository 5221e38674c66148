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

# Persistent XLA compile cache: warm suite runs drop from ~17 min to
# ~2 min on this 1-core box. Early in round 2, jaxlib 0.9's CPU
# executable (de)serialization segfaulted intermittently; a round-3
# probe (3 consecutive full runs of the compile-heavy files, cold and
# warm, rc=0) no longer reproduces it, so the cache is now DEFAULT-ON.
# Opt out with GAN_MPC_TPU_TEST_CACHE=0 if a crash in
# compilation_cache get/put ever reappears.
if os.environ.get("GAN_MPC_TPU_TEST_CACHE", "1") != "0":
    os.environ["GAN_MPC_TPU_FORCE_COMPILE_CACHE"] = "1"
    from gan_mpc_tpu import runtime_setup

    runtime_setup.setup(
        os.path.expanduser("~/.cache/gan_mpc_tpu/xla-tests")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
