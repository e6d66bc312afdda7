#!/usr/bin/env python
"""TPU gather/scatter microbenchmarks for the hash-grid redesign.

Maps the random-access landscape on the real chip so the brick-grid design
(PERF_NOTES.md roadmap #1) is built on measured numbers, not guesses:

  gather: rows/s and GB/s as a function of row width (4B .. 1.3KB), dtype
          (fp32/bf16), and table size;
  scatter: narrow 1D scatter-add vs wide-row scatter vs sort+segment_sum.

Usage:  python perf/microbench.py [gather|scatter|hashgrid|all] [--quick]

NOTE (PERF_NOTES.md #9): on the axon remote backend block_until_ready
returns before remote execution completes; only a device->host scalar fetch
synchronizes, so every timing fetches a reduced scalar.
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8


def _time(fn, *args) -> float:
    """Median seconds/iter over ITERS calls; compile excluded. fn must
    return a scalar (fetched for true synchronization)."""
    float(fn(*args))  # compile + warmup
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


# ------------------------------------------------------------------ #
# gather benchmarks
# ------------------------------------------------------------------ #


def bench_gather_rowmajor(n, t, width, dtype):
    """take of n random rows from a (t, width) table along axis 0."""
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (t, width), dtype=dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, t, jnp.int32)

    @jax.jit
    def run(table, idx):
        def body(i, acc):
            rows = jnp.take(table, (idx + i) & (t - 1), axis=0, mode="clip")
            return acc + rows.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, 4, body, jnp.zeros(()))

    sec = _time(run, table, idx) / 4
    return dict(rows_per_s=n / sec, gb_per_s=n * width * table.dtype.itemsize / sec / 1e9, ms=sec * 1e3)


def bench_gather_featmajor(n, t, f, dtype):
    """Current design: take along the minor axis of a feature-major (f, t)
    table (ops/hashgrid.py)."""
    table = jax.random.normal(jax.random.PRNGKey(0), (f, t), dtype=dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, t, jnp.int32)

    @jax.jit
    def run(table, idx):
        def body(i, acc):
            rows = jnp.take(table, (idx + i) & (t - 1), axis=1, mode="clip")
            return acc + rows.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, 4, body, jnp.zeros(()))

    sec = _time(run, table, idx) / 4
    return dict(rows_per_s=n / sec, gb_per_s=n * f * table.dtype.itemsize / sec / 1e9, ms=sec * 1e3)


def bench_gather_1d(n, t, dtype):
    """Per-feature 1D take (the '1d' mode)."""
    table = jax.random.normal(jax.random.PRNGKey(0), (t,), dtype=dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, t, jnp.int32)

    @jax.jit
    def run(table, idx):
        def body(i, acc):
            vals = jnp.take(table, (idx + i) & (t - 1), mode="clip")
            return acc + vals.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, 4, body, jnp.zeros(()))

    sec = _time(run, table, idx) / 4
    return dict(rows_per_s=n / sec, gb_per_s=n * table.dtype.itemsize / sec / 1e9, ms=sec * 1e3)


# ------------------------------------------------------------------ #
# scatter benchmarks
# ------------------------------------------------------------------ #


def bench_scatter_1d(n, t, dtype):
    """Narrow 1D scatter-add of n values into a (t,) table."""
    idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, t, jnp.int32)
    upd = jax.random.normal(jax.random.PRNGKey(2), (n,), dtype=dtype)

    @jax.jit
    def run(idx, upd):
        out = jnp.zeros((t,), dtype).at[idx].add(upd)
        return out.astype(jnp.float32).sum()

    sec = _time(run, idx, upd)
    return dict(rows_per_s=n / sec, ms=sec * 1e3)


def bench_scatter_wide(n, t, width, dtype):
    """Wide-row scatter-add (the cliff measured in round 1)."""
    idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, t, jnp.int32)
    upd = jax.random.normal(jax.random.PRNGKey(2), (n, width), dtype=dtype)

    @jax.jit
    def run(idx, upd):
        out = jnp.zeros((t, width), dtype).at[idx].add(upd)
        return out.astype(jnp.float32).sum()

    sec = _time(run, idx, upd)
    return dict(rows_per_s=n / sec, ms=sec * 1e3)


def bench_scatter_sorted_segsum(n, t, dtype):
    """sort by index + segment_sum + (sparse->dense via 1D scatter of the
    deduplicated runs).  Upper bound via full pipeline timing."""
    idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, t, jnp.int32)
    upd = jax.random.normal(jax.random.PRNGKey(2), (n,), dtype=dtype)

    @jax.jit
    def run(idx, upd):
        order = jnp.argsort(idx)
        si, su = idx[order], upd[order]
        out = jnp.zeros((t,), dtype).at[si].add(su, unique_indices=False)
        return out.astype(jnp.float32).sum()

    sec = _time(run, idx, upd)
    return dict(rows_per_s=n / sec, ms=sec * 1e3)


def bench_sort(n, dtype=jnp.int32):
    keys = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 1 << 20, dtype)

    @jax.jit
    def run(keys):
        return jnp.sort(keys).astype(jnp.float32)[-1]

    sec = _time(run, keys)
    return dict(rows_per_s=n / sec, ms=sec * 1e3)


def bench_scatter_1d_presorted(n, t, dtype):
    """1D scatter-add with already-sorted indices (spatial-coherence case:
    does XLA's scatter run faster on sorted indices?)."""
    idx = jnp.sort(
        jax.random.randint(jax.random.PRNGKey(1), (n,), 0, t, jnp.int32)
    )
    upd = jax.random.normal(jax.random.PRNGKey(2), (n,), dtype=dtype)

    @jax.jit
    def run(idx, upd):
        out = jnp.zeros((t,), dtype).at[idx].add(upd)
        return out.astype(jnp.float32).sum()

    sec = _time(run, idx, upd)
    return dict(rows_per_s=n / sec, ms=sec * 1e3)


def bench_runlength_preagg(n, t, dtype):
    """Compare-with-previous pre-aggregation + scatter of all n rows (exact;
    coherent streams make most updates hit the prev index)."""
    # synthetic coherent stream: sorted-ish blocks of repeated indices
    base = jax.random.randint(jax.random.PRNGKey(1), (n // 8,), 0, t, jnp.int32)
    idx = jnp.repeat(base, 8)
    upd = jax.random.normal(jax.random.PRNGKey(2), (n,), dtype=dtype)

    @jax.jit
    def run(idx, upd):
        # segmented sum over runs via cumsum-diff, then scatter run heads
        is_head = jnp.concatenate(
            [jnp.ones((1,), bool), idx[1:] != idx[:-1]]
        )
        csum = jnp.cumsum(upd)
        head_pos = jnp.nonzero(is_head, size=idx.shape[0], fill_value=n - 1)[0]
        seg_end = jnp.concatenate([head_pos[1:] - 1, jnp.array([n - 1])])
        seg_sum = csum[seg_end] - jnp.where(
            head_pos > 0, csum[jnp.maximum(head_pos - 1, 0)], 0.0
        )
        out = jnp.zeros((t,), dtype).at[idx[head_pos]].add(seg_sum)
        return out.astype(jnp.float32).sum()

    sec = _time(run, idx, upd)
    return dict(rows_per_s=n / sec, ms=sec * 1e3)


# ------------------------------------------------------------------ #


def main():
    p = argparse.ArgumentParser()
    p.add_argument("which", nargs="?", default="all",
                   choices=["gather", "scatter", "hashgrid", "all"])
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    n = 1 << 20 if args.quick else 1 << 23  # 1M / 8M rows

    def show(name, r):
        print(f"{name:55s} {r['rows_per_s'] / 1e6:9.1f} Mrows/s "
              f"{r.get('gb_per_s', 0):7.2f} GB/s {r['ms']:9.2f} ms")

    if args.which in ("gather", "all"):
        for dtype in (jnp.float32, jnp.bfloat16):
            dn = dtype.__name__
            show(f"gather 1d t=2^20 {dn}", bench_gather_1d(n, 1 << 20, dtype))
            show(f"gather featmajor (4,2^20) {dn}",
                 bench_gather_featmajor(n, 1 << 20, 4, dtype))
            for width in (4, 32, 108, 128, 324):
                t = max((1 << 22) // width, 1 << 12)
                t = 1 << int(math.floor(math.log2(t)))
                show(f"gather rowmajor w={width} t=2^{int(math.log2(t))} {dn}",
                     bench_gather_rowmajor(n, t, width, dtype))
        # table-size sweep at w=108 fp32
        for logt in (12, 14, 16, 18):
            show(f"gather rowmajor w=108 t=2^{logt} f32",
                 bench_gather_rowmajor(n, 1 << logt, 108, jnp.float32))

    if args.which in ("scatter", "all"):
        show("scatter 1d t=2^20 f32", bench_scatter_1d(n, 1 << 20, jnp.float32))
        show("scatter 1d presorted t=2^20 f32",
             bench_scatter_1d_presorted(n, 1 << 20, jnp.float32))
        show("scatter wide w=108 t=2^15 f32",
             bench_scatter_wide(n // 8, 1 << 15, 108, jnp.float32))
        show("scatter sorted+segsum t=2^20 f32",
             bench_scatter_sorted_segsum(n, 1 << 20, jnp.float32))
        show("sort int32 keys", bench_sort(n))
        show("runlength preagg (8x coherent) t=2^20 f32",
             bench_runlength_preagg(n, 1 << 20, jnp.float32))


if __name__ == "__main__":
    main()
    import os

    os._exit(0)  # the remote TPU runtime can hang in atexit teardown
