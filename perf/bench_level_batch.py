#!/usr/bin/env python
"""Prop-grid gather formulation: per-level takes vs ONE all-levels take
(VERDICT r3 #6a / roadmap #3 — "batch all levels of the two prop grids
into single takes; measure the bf16-transient trade").

Real prop-grid shapes (configs/default_config.yaml:56-64 via
builders.make_grid_spec): L=8 levels, b=2^17 bricks/level, w=27 lanes
(F=1, 27-corner rows), bf16 tables; N = 8192 rays x 128 samples per level
for the first proposal.  Cases:

  perlevel   L serialized takes of N rows, each from its 7.1 MB static
             level slice (the shipped formulation, ops/brickgrid.py)
  batched    ONE take of L*N rows from the full 56.6 MB table, indices
             pre-offset by level (the roadmap-#3 candidate; transient is
             L x larger: (L*N, 27) bf16 ~ 450 MB)
  pairwise   L/2 takes of 2N rows from 14 MB two-level slices (middle
             ground)

Writes perf/LEVEL_BATCH.json and prints one line per case.
Usage: python perf/bench_level_batch.py [N_rays N_samples]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 5
L, B, W = 8, 1 << 17, 27
if os.environ.get("LEVEL_BATCH_TINY"):  # CPU smoke
    ITERS, B = 2, 1 << 10


def _time(fn, *args):
    float(fn(*args))
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from emernerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    n = 8192 * 128
    if len(sys.argv) >= 3:
        n = int(sys.argv[1]) * int(sys.argv[2])
    table = jax.random.normal(jax.random.PRNGKey(0), (L * B, W), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (L, n), 0, B)

    @jax.jit
    def perlevel(table, idx):
        acc = jnp.zeros((n, 1), jnp.float32)
        for lvl in range(L):
            sl = jax.lax.slice_in_dim(table, lvl * B, (lvl + 1) * B)
            rows = jax.lax.optimization_barrier((idx[lvl], acc[0, 0]))[0]
            feats = jnp.take(sl, rows, axis=0, mode="clip")
            acc = acc + feats.astype(jnp.float32).sum(-1, keepdims=True)
        return acc.sum()

    @jax.jit
    def batched(table, idx):
        offs = (jnp.arange(L, dtype=jnp.int32) * B)[:, None]
        rows = (idx + offs).reshape(-1)  # (L*N,)
        feats = jnp.take(table, rows, axis=0, mode="clip")
        return feats.astype(jnp.float32).sum()

    @jax.jit
    def pairwise(table, idx):
        acc = jnp.zeros((), jnp.float32)
        for p in range(L // 2):
            sl = jax.lax.slice_in_dim(table, p * 2 * B, (p + 1) * 2 * B)
            pair = jnp.stack([idx[2 * p], idx[2 * p + 1] + B])
            rows = jax.lax.optimization_barrier((pair.reshape(-1), acc))[0]
            feats = jnp.take(sl, rows, axis=0, mode="clip")
            acc = acc + feats.astype(jnp.float32).sum()
        return acc

    out = {"L": L, "B": B, "W": W, "n_per_level": n, "dtype": "bf16",
           "cases": {}}
    for name, fn in (("perlevel", perlevel), ("batched", batched),
                     ("pairwise", pairwise)):
        t = _time(fn, table, idx)
        rows_s = L * n / t
        gbs = L * n * W * 2 / t / 1e9
        out["cases"][name] = {"ms": round(t * 1e3, 2),
                              "rows_per_s_M": round(rows_s / 1e6, 1),
                              "GB_s": round(gbs, 1)}
        print(f"{name:9s} {t*1e3:8.2f} ms  {rows_s/1e6:7.1f} M rows/s  "
              f"{gbs:6.1f} GB/s", flush=True)
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "LEVEL_BATCH.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
