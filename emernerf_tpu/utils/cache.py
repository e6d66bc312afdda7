"""Persistent XLA compilation cache shared by every entry point.

The flagship train step takes minutes to compile (volatile 150-900 s on
the remote TPU toolchain — PERF_NOTES.md round-4 #8); a persistent cache
makes every re-run of the same program shape start in seconds.  The test
suite (tests/conftest.py), bench.py, the CLI trainer and the graft entry
all call :func:`enable_compilation_cache` before building any jitted
function.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = "/tmp/emernerf_jax_cache"
_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the persistent compilation cache.

    Directory resolution: explicit argument > ``EMERNERF_JAX_CACHE`` env
    var > ``/tmp/emernerf_jax_cache``.  Returns the directory used.
    """
    global _enabled
    path = cache_dir or os.environ.get("EMERNERF_JAX_CACHE", _DEFAULT_DIR)
    if _enabled:
        return path
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # cache programs even when XLA reports zero compile time locally (the
    # remote backend compiles server-side; wall time is client-invisible)
    jax.config.update(
        "jax_persistent_cache_min_entry_size_bytes", -1
    )
    _enabled = True
    return path
