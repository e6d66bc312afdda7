"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (and without
paying the TPU-tunnel init cost per test run)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# the environment's sitecustomize registers the TPU backend before pytest
# starts; flip the config back to cpu-only before any backend initializes
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite's wall time is dominated by CPU
# XLA compiles (the 8-way sharded train step alone is ~6 min); cached
# re-runs skip them entirely
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("EMERNERF_JAX_CACHE", "/tmp/emernerf_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (multi-minute training runs)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip_slow = pytest.mark.skip(reason="slow: opt in with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
