#!/usr/bin/env python
"""Pallas feasibility experiments for hash-grid gather/scatter on TPU.

The XLA gather ceiling measured by perf/microbench.py is ~110M rows/s
regardless of row width — good for bricks, but the 2M rays/s north star
needs more.  These kernels probe Mosaic's dynamic VMEM addressing:

  g1: per-row dynamic VMEM loads (table resident in VMEM)
  g2: jnp.take on a VMEM-resident table value inside the kernel
  s1: per-row read-modify-write accumulation into a VMEM scratch table

Each experiment is guarded so a Mosaic lowering failure reports and moves
on instead of killing the sweep (round 1's attempt crashed the remote
compile helper).

Usage: python perf/pallas_experiments.py [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 6


def _time(fn, *args) -> float:
    float(fn(*args))
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# ------------------------------------------------------------------ #
# g1: per-row dynamic VMEM loads
# ------------------------------------------------------------------ #


def gather_loop_kernel(idx_ref, table_ref, out_ref):
    n = out_ref.shape[0]

    def body(i, _):
        out_ref[i, :] = table_ref[idx_ref[i], :]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def bench_pallas_gather_loop(n, t, width, dtype, tile=2048):
    table = jax.random.normal(jax.random.PRNGKey(0), (t, width), dtype=dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, t, jnp.int32)

    gathered = pl.pallas_call(
        gather_loop_kernel,
        out_shape=jax.ShapeDtypeStruct((n, width), dtype),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole table
        ],
        out_specs=pl.BlockSpec(
            (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )

    @jax.jit
    def run(table, idx):
        return gathered(idx, table).astype(jnp.float32).sum()

    sec = _time(run, table, idx)
    return dict(rows_per_s=n / sec, ms=sec * 1e3)


# ------------------------------------------------------------------ #
# g2: jnp.take on the VMEM table value inside the kernel
# ------------------------------------------------------------------ #


def gather_take_kernel(idx_ref, table_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)


def bench_pallas_gather_take(n, t, width, dtype, tile=2048):
    table = jax.random.normal(jax.random.PRNGKey(0), (t, width), dtype=dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, t, jnp.int32)

    gathered = pl.pallas_call(
        gather_take_kernel,
        out_shape=jax.ShapeDtypeStruct((n, width), dtype),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )

    @jax.jit
    def run(table, idx):
        return gathered(idx, table).astype(jnp.float32).sum()

    sec = _time(run, table, idx)
    return dict(rows_per_s=n / sec, ms=sec * 1e3)


# ------------------------------------------------------------------ #
# s1: per-row RMW accumulation into a VMEM scratch table
# ------------------------------------------------------------------ #


def bench_pallas_scatter_rmw(n, t, width, dtype, tile=2048):
    idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, t, jnp.int32)
    upd = jax.random.normal(jax.random.PRNGKey(2), (n, width), dtype=dtype)

    def kernel(idx_ref, upd_ref, out_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(i, _):
            r = idx_ref[i]
            acc_ref[r, :] += upd_ref[i, :]
            return 0

        jax.lax.fori_loop(0, tile, body, 0)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    scattered = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, width), dtype),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((t, width), dtype)],
    )

    @jax.jit
    def run(idx, upd):
        return scattered(idx, upd).astype(jnp.float32).sum()

    sec = _time(run, idx, upd)
    return dict(rows_per_s=n / sec, ms=sec * 1e3)


# ------------------------------------------------------------------ #


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--only", default=None)
    args = p.parse_args()
    n = 1 << 20 if args.quick else 1 << 22

    print(f"devices: {jax.devices()}", file=sys.stderr)

    cases = [
        ("g1 loop-gather t=2^14 w=128 f32",
         lambda: bench_pallas_gather_loop(n, 1 << 14, 128, jnp.float32)),
        ("g1 loop-gather t=2^15 w=128 bf16",
         lambda: bench_pallas_gather_loop(n, 1 << 15, 128, jnp.bfloat16)),
        ("g2 take-gather t=2^14 w=128 f32",
         lambda: bench_pallas_gather_take(n, 1 << 14, 128, jnp.float32)),
        ("s1 rmw-scatter t=2^13 w=128 f32",
         lambda: bench_pallas_scatter_rmw(n, 1 << 13, 128, jnp.float32)),
    ]
    for name, fn in cases:
        if args.only and args.only not in name:
            continue
        try:
            r = fn()
            print(f"{name:45s} {r['rows_per_s'] / 1e6:9.1f} Mrows/s "
                  f"{r['ms']:9.2f} ms")
        except Exception:
            print(f"{name:45s} FAILED")
            traceback.print_exc()
        sys.stdout.flush()


if __name__ == "__main__":
    main()
    import os

    os._exit(0)
