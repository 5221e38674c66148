"""Process-level runtime configuration.

Called by the runner entry points. Currently: enables JAX's persistent
compilation cache (first compile of the bigger jitted programs costs
minutes on TPU; subsequent runs of the same shapes load from disk).
"""

from __future__ import annotations

import os

import jax

_DONE = False


def setup(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    # honor JAX_PLATFORMS even though this image's sitecustomize
    # pre-imports jax with a TPU plugin (the env var alone is consumed
    # too early there; jax.config still works until a backend
    # initializes). `JAX_PLATFORMS=cpu python -m gan_mpc_tpu.runners...`
    # must actually run on CPU.
    requested = os.environ.get("JAX_PLATFORMS")
    if requested:
        try:
            jax.config.update("jax_platforms", requested)
        except Exception:
            pass
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    # jaxlib 0.9's CPU executable (de)serialization segfaults
    # intermittently (observed in compilation_cache get/put on this
    # image), so the persistent cache is enabled only for accelerator
    # backends unless explicitly forced.
    if backend == "cpu" and not os.environ.get(
        "GAN_MPC_TPU_FORCE_COMPILE_CACHE"
    ):
        return
    cache_dir = cache_dir or os.environ.get(
        "GAN_MPC_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/gan_mpc_tpu/xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # caching is an optimization; never fail a run over it
