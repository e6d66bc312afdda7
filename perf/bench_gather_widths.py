#!/usr/bin/env python
"""Gather/scatter rate vs row width / batch size on v5e.

Decides the 4D brick-row formulation: two w108 takes (time slices) vs one
w216 take (paired rows), per-level takes vs one all-level take, and how
the rate scales with N — the per-op fixed overhead is large enough that
batching strategy dominates layout at training shapes.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 5


def _time(fn, *args):
    float(fn(*args))
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def gather_case(name, b, w, n, n_ops, dtype=jnp.bfloat16):
    """n_ops serialized takes of n rows each from a (b, w) operand."""
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (n_ops * b, w), dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n_ops, n), 0, b)

    @jax.jit
    def run(table, idx):
        acc = jnp.zeros((n, 1), jnp.float32)
        prev = None
        for op in range(n_ops):
            rows = idx[op]
            if prev is not None:
                rows = jax.lax.optimization_barrier((rows, prev))[0]
            sl = jax.lax.slice_in_dim(table, op * b, (op + 1) * b)
            feats = jnp.take(sl, rows, axis=0, mode="clip")
            # consume EVERY lane so XLA can't narrow the gather
            r = feats.astype(jnp.float32).sum(axis=1, keepdims=True)
            acc = acc + r
            prev = r
        return acc.sum()

    s = _time(run, table, idx)
    rows = n * n_ops
    gb = rows * w * table.dtype.itemsize / 1e9
    print(f"{name:52s} {s * 1e3:8.2f} ms  {rows / s / 1e6:7.1f} M rows/s  "
          f"{gb / s:6.1f} GB/s", flush=True)


def scatter_case(name, b, w, n, n_ops):
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n_ops, n), 0, b)
    upd = jax.random.normal(key, (n, w), jnp.float32)

    @jax.jit
    def run(idx, upd):
        outs = []
        prev = None
        for op in range(n_ops):
            rows = idx[op]
            if prev is not None:
                rows = jax.lax.optimization_barrier((rows, prev))[0]
            d = jnp.zeros((b, w), jnp.float32)
            d = d.at[rows].add(upd)
            prev = d[0]
            outs.append(d.sum())
        return sum(outs)

    s = _time(run, idx, upd)
    rows = n * n_ops
    print(f"{name:52s} {s * 1e3:8.2f} ms  {rows / s / 1e6:7.1f} M rows/s",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "gather"):
        n = 1 << 19  # 524288, per-branch final-sample count
        # width sweep at fixed rows (10 ops of n) from 14MB-ish operands
        for w in (108, 128, 216, 256):
            b = 1 << 15
            gather_case(f"w={w:4d} b=2^15 10 x take(n=512k)", b, w, n, 10)
        # batch-size sweep at w=216
        for mult, ops in ((1, 10), (2, 5), (5, 2), (10, 1)):
            gather_case(
                f"w=216 b=2^15 {ops} x take(n={mult}x512k)",
                1 << 15, 216, n * mult, ops,
            )
        # batch-size sweep at w=108 (two-slice formulation: 20 narrow takes
        # vs fewer big ones)
        for mult, ops in ((1, 20), (4, 5), (20, 1)):
            gather_case(
                f"w=108 b=2^15 {ops} x take(n={mult}x512k)",
                1 << 15, 108, n * mult, ops,
            )

    if which in ("all", "scatter"):
        n = 1 << 19
        for w in (108, 216):
            scatter_case(f"scatter w={w} b=2^15 10 x (n=512k)", 1 << 15, w,
                         n, 10)
        for mult, ops in ((2, 5), (5, 2)):
            scatter_case(
                f"scatter w=216 b=2^15 {ops} x (n={mult}x512k)",
                1 << 15, 216, n * mult, ops,
            )


if __name__ == "__main__":
    main()
    import os

    os._exit(0)
