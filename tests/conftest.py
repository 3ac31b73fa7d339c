"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is a single chip behind a slow tunnel in this environment
(JAX_PLATFORMS=axon is pre-set); tests run on host CPU with 8 virtual devices
so multi-chip sharding is exercised, per the standard JAX testing recipe.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already have been imported (pytest plugins), in which case the env
# var was captured too early — force the config directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
