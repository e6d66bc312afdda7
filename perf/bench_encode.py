#!/usr/bin/env python
"""Hash-grid vs brick-grid encode throughput at training-workload scale.

Per train step the full model encodes ~1M final samples x 10 levels x
(1 static + 3 dynamic + 3 flow queries) + ~3M prop samples x 8 levels, all
through these encoders — this bench measures one query's fwd and fwd+bwd
cost so kernel decisions are made at realistic shapes.

Usage: python perf/bench_encode.py [--n 524288] [--mode fwd|bwd|both]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from emernerf_tpu.ops.brickgrid import (  # noqa: E402
    BrickGridSpec,
    brickgrid_encode,
    init_brickgrid_table,
)
from emernerf_tpu.ops.hashgrid import (  # noqa: E402
    HashGridSpec,
    hashgrid_encode,
    init_hashgrid_table,
)

ITERS = 6


def _time(fn, *args):
    float(fn(*args))
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench(name, encode, table, x, spec, needs_pos_grad, mode):
    n = x.shape[0]

    @jax.jit
    def fwd(table, x):
        return encode(table, x, spec, needs_pos_grad).astype(jnp.float32).sum()

    @jax.jit
    def bwd(table, x):
        def loss(tab, pts):
            return encode(tab, pts, spec, needs_pos_grad).astype(
                jnp.float32
            ).sum()

        if needs_pos_grad:
            gt, gx = jax.grad(loss, argnums=(0, 1))(table, x)
            return gt.astype(jnp.float32).sum() + gx.sum()
        return jax.grad(loss)(table, x).astype(jnp.float32).sum()

    if mode in ("fwd", "both"):
        s = _time(fwd, table, x)
        print(f"{name:48s} fwd      {n / s / 1e6:8.2f} Mpts/s  {s * 1e3:8.2f} ms",
              flush=True)
    if mode in ("bwd", "both"):
        s = _time(bwd, table, x)
        print(f"{name:48s} fwd+bwd  {n / s / 1e6:8.2f} Mpts/s  {s * 1e3:8.2f} ms",
              flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 19)
    p.add_argument("--mode", default="both", choices=["fwd", "bwd", "both"])
    p.add_argument("--which", default="all")
    args = p.parse_args()
    n = args.n
    print(f"devices: {jax.devices()}  n={n}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    x3 = jax.random.uniform(key, (n, 3))
    x4 = jax.random.uniform(key, (n, 4))

    cases = []
    # reference-scale static grid: 10 levels, F=4, 2^20 hash / 2^17 bricks
    hs3 = HashGridSpec(3, 10, 16, 8192, 20, 4)
    bs3 = BrickGridSpec(3, 10, 16, 8192, 17, 4)
    # dynamic/flow-scale 4D: 10 levels, F=4, 2^18 hash / 2^15 bricks
    hs4 = HashGridSpec(4, 10, 32, 8192, 18, 4)
    bs4 = BrickGridSpec(4, 10, 32, 8192, 15, 4)
    # production 4D layout: time-paired rows, one gather per (point, level)
    bs4tp = BrickGridSpec(4, 10, 32, 8192, 15, 4, time_pair=True)

    for dtype_name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        cases += [
            (f"hash3d L10 F4 2^20 {dtype_name}", hashgrid_encode,
             init_hashgrid_table(key, hs3, dtype), x3, hs3, False),
            (f"brick3d L10 F4 2^17 {dtype_name}", brickgrid_encode,
             init_brickgrid_table(key, bs3, dtype), x3, bs3, False),
            (f"hash4d L10 F4 2^18 {dtype_name} posgrad", hashgrid_encode,
             init_hashgrid_table(key, hs4, dtype), x4, hs4, True),
            (f"brick4d L10 F4 2^15 {dtype_name} posgrad", brickgrid_encode,
             init_brickgrid_table(key, bs4, dtype), x4, bs4, True),
            (f"brick4d-tpair L10 F4 2^15 {dtype_name} posgrad",
             brickgrid_encode,
             init_brickgrid_table(key, bs4tp, dtype), x4, bs4tp, True),
        ]

    for name, enc, table, x, spec, npg in cases:
        if args.which != "all" and args.which not in name:
            continue
        try:
            bench(name, enc, table, x, spec, npg, args.mode)
        except Exception as e:
            print(f"{name:48s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
    import os

    os._exit(0)
