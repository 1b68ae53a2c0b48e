"""Test configuration.

Default: force CPU backend with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md §4 — the multi-device test net the
reference lacks).

TPU mode: `pytest -m tpu tests/test_tpu.py` (or AQP_TEST_TPU=1) keeps the
real backend so the production Pallas geometry (Rho3Params defaults, MXU
extraction, hybrid merges) is executed on hardware — the regression net the
round-2 verdict flagged as missing.  TPU tests are skipped on CPU; CPU
tests still pass on the TPU backend but are not run there by default.
"""

import os

import pytest

TPU_MODE = os.environ.get("AQP_TEST_TPU") == "1"

if not TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
else:
    # Pallas bitonic blocks at sub>=1024 need the scoped-VMEM raise; must
    # be set before the first TPU compile (bench.py sets the same default).
    os.environ.setdefault(
        "LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")

# Persistent compilation cache: the suite is compile-bound on CPU; repeat
# runs hit the cache and finish in seconds.
import jax  # noqa: E402

if not TPU_MODE:
    # The environment's sitecustomize registers the axon TPU plugin and
    # forces the platform list; override back to CPU for hermetic tests.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/aqp_tpu_jax_cache")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires real TPU hardware (AQP_TEST_TPU=1)")


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(
        reason="TPU hardware tests: run AQP_TEST_TPU=1 pytest -m tpu")
    for item in items:
        if "tpu" in item.keywords and not TPU_MODE:
            item.add_marker(skip_tpu)
