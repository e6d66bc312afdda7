#!/usr/bin/env python
"""Scatter-ceiling experiments (VERDICT round-1 next #1).

The no-rg train step spends ~470 ms of 1126 ms in table-grad scatter-adds
(26M rows/step at the measured ~45M rows/s wall).  This bench measures
every candidate replacement at the REAL flagship shapes:

  static 3D grid : N=524288 rows/level, W=108  (27c x F4),  T=2^17
  fused 4D grid  : N=524288 rows/level, W=432  (2t x 27c x F8), T=2^15
  warped queries : N=262144 rows/level, W=432

Candidates:
  base     wide scatter-add into a (T, W) fp32 buffer  (current)
  bf16     same, bf16 buffer (half the RMW bytes)
  sorted   sort indices + gather updates in sorted order +
           scatter(indices_are_sorted)
  merged   ONE scatter for all 10 levels (global rows) vs 10 separate
  onehot   dense one-hot einsum (MXU) for small-T levels
  pallas   Pallas one-hot-matmul accumulator for small-T levels
  sub4     scatter a strided 1/4 subsample of rows, x4 scaled (unbiased)

Usage: python perf/bench_scatter_alts.py [--case NAME] [--iters 6]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from emernerf_tpu.utils.cache import enable_compilation_cache  # noqa: E402

ITERS = 6
# loop reps INSIDE the jitted fn: the axon remote backend has a fixed
# ~10-20ms dispatch+fetch overhead per call, which dominates 20ms-scale
# measurements.  We time at reps=REPS_HI and reps=REPS_LO and report the
# SLOPE (marginal per-rep cost), cancelling the fixed overhead.
REPS_LO = 2
REPS_HI = 10


def _time(make_run, *args) -> float:
    """make_run(reps) -> jitted fn; returns marginal seconds per rep."""
    ts = {}
    for reps in (REPS_LO, REPS_HI):
        fn = make_run(reps)
        float(fn(*args))
        samples = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            float(fn(*args))
            samples.append(time.perf_counter() - t0)
        ts[reps] = float(np.median(samples))
    return (ts[REPS_HI] - ts[REPS_LO]) / (REPS_HI - REPS_LO)


def make_inputs(n, t, w, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    rows = jax.random.randint(k1, (n,), 0, t, jnp.int32)
    upd = jax.random.normal(k2, (n, w), jnp.float32)
    return rows, upd


def report(name, n, w, sec):
    print(
        f"{name:34s} {sec * 1e3:9.2f} ms   {n / sec / 1e6:8.1f} Mrows/s   "
        f"{n * w * 4 / sec / 1e9:7.1f} GB/s(upd)",
        flush=True,
    )


def _reps_loop(reps, body):
    """fori_loop(0, reps, ...) accumulating a scalar to defeat DCE."""

    @jax.jit
    def run(*args):
        return jax.lax.fori_loop(
            0, reps, lambda i, acc: acc + body(i, *args), jnp.zeros(())
        )

    return run


# ------------------------------------------------------------------ #
def case_base(n, t, w, dtype=jnp.float32, tag=""):
    rows, upd = make_inputs(n, t, w)

    def make_run(reps):
        def body(i, rows, upd):
            buf = jnp.zeros((t, w), dtype)
            buf = buf.at[(rows + i) % t].add(upd.astype(dtype))
            return buf.astype(jnp.float32).sum()

        return _reps_loop(reps, body)

    sec = _time(make_run, rows, upd)
    report(f"base{tag} N={n} W={w} T={t} {jnp.dtype(dtype).name}", n, w, sec)
    return sec


def case_sorted(n, t, w):
    rows, upd = make_inputs(n, t, w)

    def make_run(reps):
        def body(i, rows, upd):
            r = (rows + i) % t
            order = jnp.argsort(r)
            rs = jnp.take(r, order)
            us = jnp.take(upd, order, axis=0)
            buf = jnp.zeros((t, w), jnp.float32)
            buf = buf.at[rs].add(us, indices_are_sorted=True)
            return buf.sum()

        return _reps_loop(reps, body)

    sec = _time(make_run, rows, upd)
    report(f"sorted N={n} W={w} T={t}", n, w, sec)
    return sec


def case_sorted_presort(n, t, w):
    """Scatter-only cost when indices are ALREADY sorted (upper bound)."""
    rows, upd = make_inputs(n, t, w)
    rows = jnp.sort(rows)

    def make_run(reps):
        def body(i, rows, upd):
            buf = jnp.zeros((t, w), jnp.float32)
            buf = buf.at[rows].add(upd + i, indices_are_sorted=True)
            return buf.sum()

        return _reps_loop(reps, body)

    sec = _time(make_run, rows, upd)
    report(f"presorted N={n} W={w} T={t}", n, w, sec)
    return sec


def case_merged(n_per_level, t, w, levels=10):
    """ONE scatter of L*N rows into the full (L*T, W) table."""
    n = n_per_level * levels
    rows, upd = make_inputs(n, t, w)
    lvl_off = (jnp.arange(n, dtype=jnp.int32) // n_per_level) * t
    rows = rows + lvl_off

    def make_run(reps):
        def body(i, rows, upd):
            buf = jnp.zeros((t * levels, w), jnp.float32)
            buf = buf.at[(rows + i) % (t * levels)].add(upd)
            return buf.sum()

        return _reps_loop(reps, body)

    sec = _time(make_run, rows, upd)
    report(f"merged L={levels} N={n} W={w}", n, w, sec)
    return sec


def case_onehot(n, t, w, chunk=65536):
    """Dense one-hot einsum over N chunks: grad[t] = sum_n 1[rows==t]*upd."""
    rows, upd = make_inputs(n, t, w)

    def make_run(reps):
        def body(i, rows, upd):
            def chunk_body(c, buf):
                r = jax.lax.dynamic_slice(rows, (c * chunk,), (chunk,))
                u = jax.lax.dynamic_slice(upd, (c * chunk, 0), (chunk, w))
                oh = (
                    (r + i)[:, None] % t
                    == jnp.arange(t, dtype=jnp.int32)[None, :]
                ).astype(jnp.bfloat16)
                return buf + jax.lax.dot_general(
                    oh.T, u.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            buf = jax.lax.fori_loop(
                0, n // chunk, chunk_body, jnp.zeros((t, w), jnp.float32)
            )
            return buf.sum()

        return _reps_loop(reps, body)

    sec = _time(make_run, rows, upd)
    report(f"onehot N={n} W={w} T={t}", n, w, sec)
    return sec


def case_pallas_onehot(n, t, w, tile_n=2048):
    """Pallas kernel: VMEM-resident (T, W) fp32 accumulator; per N-tile
    build the one-hot in VMEM and accumulate with an MXU matmul."""
    from jax.experimental import pallas as pl

    rows, upd = make_inputs(n, t, w)

    def kernel(rows_ref, upd_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        r = rows_ref[...]  # (tile_n,)
        u = upd_ref[...]  # (tile_n, w)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (tile_n, t), 1)
        oh = (r[:, None] == iota_t).astype(jnp.bfloat16)  # (tile_n, t)
        out_ref[...] += jax.lax.dot_general(
            oh, u.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    grid = (n // tile_n,)
    f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n,), lambda i: (i,)),
            pl.BlockSpec((tile_n, w), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((t, w), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, w), jnp.float32),
    )

    def make_run(reps):
        def body(i, rows, upd):
            return f(rows, upd + i).sum()

        return _reps_loop(reps, body)

    sec = _time(make_run, rows, upd)
    report(f"pallas_onehot N={n} W={w} T={t}", n, w, sec)
    return sec


def case_sub4(n, t, w, k=4):
    """Scatter every k-th row (random phase), scaled by k (unbiased)."""
    rows, upd = make_inputs(n, t, w)
    m = n // k

    def make_run(reps):
        def body(i, rows, upd):
            sel = (i % k) + k * jnp.arange(m, dtype=jnp.int32)
            r = jnp.take(rows, sel)
            u = jnp.take(upd, sel, axis=0) * float(k)
            buf = jnp.zeros((t, w), jnp.float32)
            buf = buf.at[r].add(u)
            return buf.sum()

        return _reps_loop(reps, body)

    sec = _time(make_run, rows, upd)
    report(f"sub{k} N={n}->{m} W={w} T={t}", n, w, sec)
    return sec


# ------------------------------------------------------------------ #
CASES = "base,width,sorted,merged,onehot,pallas,sub".split(",")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="all")
    ap.add_argument("--iters", type=int, default=ITERS)
    args = ap.parse_args()
    globals()["ITERS"] = args.iters
    enable_compilation_cache()
    want = lambda c: args.case in ("all", c)

    N, NW = 524288, 262144
    if want("base"):
        case_base(N, 1 << 17, 108)
        case_base(N, 1 << 15, 432)
        case_base(NW, 1 << 15, 432, tag="(warp)")
    if want("width"):
        case_base(N, 1 << 15, 432, jnp.bfloat16)
        case_base(N, 1 << 17, 108, jnp.bfloat16)
        case_base(N, 1 << 15, 216)
        case_base(N, 1 << 15, 128)
    if want("sorted"):
        case_sorted(N, 1 << 15, 432)
        case_sorted_presort(N, 1 << 15, 432)
        case_sorted(N, 1 << 17, 108)
        case_sorted_presort(N, 1 << 17, 108)
    if want("merged"):
        case_merged(N, 1 << 15, 108, levels=10)
    if want("onehot"):
        case_onehot(N, 512, 108)
        case_onehot(N, 4096, 108)
        case_onehot(N, 4096, 432)
    if want("onehot2"):
        case_onehot(N, 8192, 108)
        case_onehot(N, 16384, 108)
        case_onehot(N, 2048, 432)
        case_onehot(N, 8192, 432)
        case_onehot(NW, 4096, 432)
    if want("pallas"):
        case_pallas_onehot(N, 512, 108)
        case_pallas_onehot(N, 4096, 108)
        case_pallas_onehot(N, 2048, 432)
        case_pallas_onehot(N, 4096, 432, tile_n=1024)
    if want("sub"):
        case_sub4(N, 1 << 15, 432, k=4)
        case_sub4(N, 1 << 15, 432, k=8)
        case_sub4(N, 1 << 17, 108, k=4)


if __name__ == "__main__":
    main()
    import os

    os._exit(0)
