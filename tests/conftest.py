"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run without TPU hardware (SURVEY.md §4 — the multi-device test net the
reference lacks)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the suite is compile-bound on CPU; repeat
# runs hit the cache and finish in seconds.
import jax

# The environment's sitecustomize registers the axon TPU plugin and forces
# the platform list; override back to CPU for hermetic, fast tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/aqp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
