"""Test config: force CPU backend with 8 virtual devices (multi-chip
sharding tests run on a virtual mesh, mirroring SURVEY.md §4's plan).

NOTE: this environment preimports jax via sitecustomize with
JAX_PLATFORMS=axon (the real-TPU tunnel).  Env vars are read at jax
import time, so the only reliable override is jax.config.update.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
