#!/usr/bin/env python
"""Attribute 4D brick-encode cost: gather-only floor vs reduce vs aux vs
scatter, at the training shape (N=524288, L=10, F=4, 2^15 brick rows).

Answers: why is the encode not gather-rate-bound (microbench says ~250M
rows/s for <=33MB slices; the full encode runs ~5x slower than that floor)?
"""

from __future__ import annotations

import argparse
import os
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

ITERS = 6


def _time(fn, *args):
    float(fn(*args))
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def report(name, s, n_rows):
    print(f"{name:44s} {s * 1e3:8.2f} ms   {n_rows / s / 1e6:8.1f} M rows/s",
          flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 19)
    p.add_argument("--levels", type=int, default=10)
    p.add_argument("--width", type=int, default=216)
    p.add_argument("--rows", type=int, default=1 << 15)
    args = p.parse_args()
    n, L, W, B = args.n, args.levels, args.width, args.rows
    print(f"devices: {jax.devices()}  n={n} L={L} W={W} B={B}",
          file=sys.stderr)

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (L * B, W), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (L, n), 0, B)
    x4 = jax.random.uniform(jax.random.PRNGKey(2), (n, 4))

    # 1. gather floor: L serialized takes from static slices, trivial reduce
    @jax.jit
    def gather_only(table, idx):
        acc = jnp.zeros((n, 4), jnp.float32)
        prev = None
        for lvl in range(L):
            rows = idx[lvl]
            if prev is not None:
                rows = jax.lax.optimization_barrier((rows, prev))[0]
            sl = jax.lax.slice_in_dim(table, lvl * B, (lvl + 1) * B)
            feats = jnp.take(sl, rows, axis=0, mode="clip")
            r = feats[:, :4].astype(jnp.float32)
            acc = acc + r
            prev = r
        return acc.sum()

    report("gather-only (trivial reduce)", _time(gather_only, table, idx),
           n * L)

    # 2. gather + 27-corner weighted reduce (unrolled lane slices, as in
    # _reduce_row), single output
    w27 = [jax.random.normal(jax.random.PRNGKey(10 + c), (n,)) for c in
           range(27)]

    @jax.jit
    def gather_reduce(table, idx):
        acc = jnp.zeros((n, 4), jnp.float32)
        prev = None
        f = 4
        for lvl in range(L):
            rows = idx[lvl]
            if prev is not None:
                rows = jax.lax.optimization_barrier((rows, prev))[0]
            sl = jax.lax.slice_in_dim(table, lvl * B, (lvl + 1) * B)
            feats = jnp.take(sl, rows, axis=0, mode="clip")
            r = None
            for ci in range(27):
                term = feats[:, ci * f:(ci + 1) * f] * w27[ci].astype(
                    feats.dtype)[:, None]
                r = term if r is None else r + term
            r = r.astype(jnp.float32)
            acc = acc + r
            prev = r
        return acc.sum()

    report("gather + 27-slice reduce", _time(gather_reduce, table, idx),
           n * L)

    # 2b. gather + reduce via (N, 27, F) dot: one matvec over corners
    @jax.jit
    def gather_reduce_dot(table, idx):
        acc = jnp.zeros((n, 4), jnp.float32)
        prev = None
        w = jnp.stack(w27, axis=-1)  # (n, 27)
        for lvl in range(L):
            rows = idx[lvl]
            if prev is not None:
                rows = jax.lax.optimization_barrier((rows, prev))[0]
            sl = jax.lax.slice_in_dim(table, lvl * B, (lvl + 1) * B)
            feats = jnp.take(sl, rows, axis=0, mode="clip")
            r = jnp.einsum(
                "nc,ncf->nf", w.astype(feats.dtype),
                feats[:, :108].reshape(n, 27, 4)
            ).astype(jnp.float32)
            acc = acc + r
            prev = r
        return acc.sum()

    report("gather + einsum reduce", _time(gather_reduce_dot, table, idx),
           n * L)

    # 3. full encode fwd, no pos grad
    spec = BrickGridSpec(4, L, 32, 8192, 15, 4, time_pair=True)
    tab = init_brickgrid_table(key, spec, jnp.bfloat16)

    @jax.jit
    def enc_fwd(tab, x):
        return brickgrid_encode(tab, x, spec, False).astype(jnp.float32).sum()

    report("encode fwd (no posgrad)", _time(enc_fwd, tab, x4), n * L)

    # 4. fwd+bwd table-grad only (no pos grad): scatter cost on top
    @jax.jit
    def enc_bwd_tab(tab, x):
        return jax.grad(
            lambda t: brickgrid_encode(t, x, spec, False).astype(
                jnp.float32).sum()
        )(tab).astype(jnp.float32).sum()

    report("encode fwd+bwd (table grad only)", _time(enc_bwd_tab, tab, x4),
           n * L)

    # 5/6. fwd+bwd with pos grads: fwd-aux vs regather
    for mode in ("fwd", "regather"):
        os.environ["EMERNERF_POSGRAD"] = mode

        @jax.jit
        def enc_bwd_pos(tab, x):
            gt, gx = jax.grad(
                lambda t, p: brickgrid_encode(t, p, spec, True).astype(
                    jnp.float32).sum(),
                argnums=(0, 1),
            )(tab, x)
            return gt.astype(jnp.float32).sum() + gx.sum()

        report(f"encode fwd+bwd (+posgrad {mode})",
               _time(enc_bwd_pos, tab, x4), n * L)

    # 7. scatter floor: one wide (n, W) f32 scatter per level
    upd = jax.random.normal(jax.random.PRNGKey(3), (n, W), jnp.float32)

    @jax.jit
    def scatter_only(idx, upd):
        outs = []
        prev = None
        for lvl in range(L):
            rows = idx[lvl]
            if prev is not None:
                rows = jax.lax.optimization_barrier((rows, prev))[0]
            d = jnp.zeros((B, W), jnp.float32)
            d = d.at[rows].add(upd)
            outs.append(d)
            prev = d[0]
        return sum(o.sum() for o in outs)

    report("scatter-only wide f32", _time(scatter_only, idx, upd), n * L)


if __name__ == "__main__":
    main()
    os._exit(0)
