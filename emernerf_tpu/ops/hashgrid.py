"""Multi-resolution hash-grid encoding (Instant-NGP style) for TPU.

TPU-native replacement for the tiny-cuda-nn HashGrid encoding the reference
wraps at /root/reference/third_party/tcnn_modules.py:115-263 and configures at
/root/reference/radiance_fields/encodings.py:107-160.  Semantics follow the
Instant-NGP paper (Mueller et al. 2022, arXiv:2201.05989):

  * per level l: ``scale_l = 2^(l * log2(growth)) * base_resolution - 1``,
    ``growth = exp((ln(max_res) - ln(base_res)) / (n_levels - 1))``,
    resolution ``R_l = ceil(scale_l) + 1``
  * ``pos = x * scale_l + 0.5``; corner = floor(pos); d-linear interpolation
    over the 2^D corners (trilinear for 3D, quadrilinear for 4D space-time)
  * corner index: linear (collision-free) when ``R_l^D`` fits the table,
    otherwise the spatial hash ``xor_d(corner_d * primes_d)``, masked to the
    table size (a power of two)

Design difference from tcnn (deliberate, TPU-first): every level owns a full
``2^log2_hashmap_size`` slice of a single dense ``(L*T, F)`` table so the
whole encoder is ONE XLA gather with statically-shaped indices — no per-level
offsets, no dynamic shapes.  The backward pass is XLA's native scatter-add
into the table; a fused Pallas kernel can replace both paths without changing
this interface.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from functools import cached_property, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Spatial-hash primes from Instant-NGP (Teschner et al. hashing; prime_0 = 1
# so that the first dim is identity, as in tiny-cuda-nn).
_PRIMES = (1, 2654435761, 805459861, 3674653429)




# max elements per chunked 2D take: bounds the padded [chunk, 128] gather
# temp to ~1 GB f32
_CHUNK_ELEMS = 1 << 21


def _n_chunks(n: int, c: int):
    """Split the point axis so each chunk's c*nb stays under _CHUNK_ELEMS."""
    nb = max(_CHUNK_ELEMS // c, 1)
    return [(a, min(a + nb, n)) for a in range(0, n, nb)]


@dataclass(frozen=True)
class HashGridSpec:
    """Static description of a hash-grid encoder.

    Defaults mirror the reference HashEncoder defaults
    (/root/reference/radiance_fields/encodings.py:110-118).
    """

    n_input_dims: int = 3
    n_levels: int = 16
    base_resolution: int = 16
    max_resolution: int = 2048
    log2_hashmap_size: int = 19
    n_features_per_level: int = 2
    # gather formulation: "2d" (single take per level, chunked along N
    # with serialization barriers to bound the lane-padded gather temps;
    # fastest measured) or "1d" (per-feature takes, no padded temps).
    # Config-visible; EMERNERF_GATHER env var overrides for debugging.
    gather_mode: str = "2d"

    @property
    def gather(self) -> str:
        return os.environ.get("EMERNERF_GATHER", self.gather_mode)

    @property
    def growth_factor(self) -> float:
        if self.n_levels <= 1:
            return 1.0
        return math.exp(
            (math.log(self.max_resolution) - math.log(self.base_resolution))
            / (self.n_levels - 1)
        )

    @property
    def table_entries_per_level(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def table_shape(self) -> Tuple[int, int]:
        """Feature-major (F, L*T): the minor dimension is the huge
        table axis, so gathers/scatters tile densely on TPU.  A
        features-minor (L*T, F) layout gets padded F: 4 -> 128 lanes by the
        TPU tiling — 32x wasted HBM and a catastrophically slow gather
        (measured 54 ms vs 105 s for one level's gathers on v5e)."""
        return (
            self.n_features_per_level,
            self.n_levels * self.table_entries_per_level,
        )

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level

    @property
    def num_parameters(self) -> int:
        return self.table_shape[0] * self.table_shape[1]

    @cached_property
    def level_scales(self) -> np.ndarray:
        log2g = math.log2(self.growth_factor)
        return np.asarray(
            [
                math.exp2(l * log2g) * self.base_resolution - 1.0
                for l in range(self.n_levels)
            ],
            dtype=np.float64,
        )

    @cached_property
    def level_resolutions(self) -> np.ndarray:
        return np.asarray(
            [int(math.ceil(s)) + 1 for s in self.level_scales], dtype=np.int64
        )

    @cached_property
    def level_uses_hash(self) -> np.ndarray:
        """Per-level bool: True when R^D exceeds the table and the spatial
        hash must be used (computed with exact Python ints; no overflow)."""
        t = self.table_entries_per_level
        return np.asarray(
            [int(r) ** self.n_input_dims > t for r in self.level_resolutions],
            dtype=bool,
        )


def init_hashgrid_table(key, spec: HashGridSpec, dtype=jnp.float32, scale=1e-4):
    """tcnn initializes hash tables with U(-1e-4, 1e-4)."""
    return jax.random.uniform(
        key, spec.table_shape, dtype=dtype, minval=-scale, maxval=scale
    )


def _corner_offsets(d: int) -> np.ndarray:
    """(2^D, D) array of corner bits."""
    n = 1 << d
    return np.asarray(
        [[(c >> i) & 1 for i in range(d)] for c in range(n)], dtype=np.int32
    )


def _corner_indices(spec: HashGridSpec, corners: jnp.ndarray) -> jnp.ndarray:
    """Map integer corner coords to table rows.

    corners: (N, L, C, D) int32 grid coordinates.
    Returns: (N, L, C) int32 global rows into the (L*T, F) table.
    """
    d = spec.n_input_dims
    t_mask = np.uint32(spec.table_entries_per_level - 1)
    resolutions = spec.level_resolutions  # (L,) python ints

    cu = corners.astype(jnp.uint32)

    # --- spatial hash: xor of corner_d * prime_d (uint32 wraparound) ------
    hashed = cu[..., 0] * jnp.uint32(_PRIMES[0])
    for i in range(1, d):
        hashed = hashed ^ (cu[..., i] * jnp.uint32(_PRIMES[i]))

    # --- linear index: sum corner_d * R^d per level ------------------------
    # strides precomputed per level with exact ints, wrapped to uint32 the
    # same way a stride register would (irrelevant for levels that hash).
    strides = np.stack(
        [
            np.asarray(
                [(int(r) ** i) & 0xFFFFFFFF for r in resolutions], dtype=np.uint32
            )
            for i in range(d)
        ],
        axis=-1,
    )  # (L, D)
    linear = (cu * jnp.asarray(strides)[None, :, None, :]).sum(
        axis=-1, dtype=jnp.uint32
    )

    uses_hash = jnp.asarray(spec.level_uses_hash)[None, :, None]
    idx = jnp.where(uses_hash, hashed, linear) & t_mask

    level_offsets = (
        np.arange(spec.n_levels, dtype=np.int64) * spec.table_entries_per_level
    ).astype(np.int32)
    return idx.astype(jnp.int32) + jnp.asarray(level_offsets)[None, :, None]


def _rows_frac(x: jnp.ndarray, spec: HashGridSpec):
    """Shared index/weight computation: x (N, D) in [0,1] ->
    (rows (N,L,C), frac (N,L,D), offsets (C,D))."""
    d = spec.n_input_dims
    scales = jnp.asarray(spec.level_scales, dtype=jnp.float32)  # (L,)
    pos = x[:, None, :].astype(jnp.float32) * scales[None, :, None] + 0.5
    grid = jnp.floor(pos)
    frac = pos - grid
    grid = grid.astype(jnp.int32)  # (N, L, D)

    offsets = jnp.asarray(_corner_offsets(d))  # (C, D)
    corners = grid[:, :, None, :] + offsets[None, None, :, :]  # (N, L, C, D)
    rows = _corner_indices(spec, corners)  # (N, L, C)
    return rows, frac, offsets


def _interp_weights(frac, offsets):
    """d-linear interpolation weights: prod_d (bit ? frac : 1 - frac)."""
    return jnp.where(
        offsets[None, None, :, :] == 1,
        frac[:, :, None, :],
        1.0 - frac[:, :, None, :],
    ).prod(axis=-1)  # (N, L, C)


def hashgrid_encode_ref(
    table: jnp.ndarray, positions: jnp.ndarray, spec: HashGridSpec
) -> jnp.ndarray:
    """Reference implementation relying on XLA autodiff (gather/scatter).
    Used by tests as the oracle for the custom-VJP version below.
    table: feature-major (F, L*T)."""
    d = spec.n_input_dims
    batch_shape = positions.shape[:-1]
    x = positions.reshape(-1, d)
    n = x.shape[0]
    rows, frac, offsets = _rows_frac(x, spec)
    w = _interp_weights(frac, offsets)  # (N, L, C)
    feats = jnp.take(
        table, rows.reshape(-1), axis=1, mode="clip"
    ).reshape(spec.n_features_per_level, *rows.shape)  # (F, N, L, C)
    out = (feats * w[None].astype(table.dtype)).sum(axis=-1)  # (F, N, L)
    out = jnp.moveaxis(out, 0, -1)  # (N, L, F)
    return out.reshape(*batch_shape, spec.n_output_dims)


def _level_constants(spec: HashGridSpec):
    """Per-level constants (numpy, so XLA folds them at trace time)."""
    d = spec.n_input_dims
    scales = np.asarray(spec.level_scales, dtype=np.float32)  # (L,)
    strides = np.stack(
        [
            np.asarray(
                [(int(r) ** i) & 0xFFFFFFFF for i in range(d)],
                dtype=np.uint32,
            )
            for r in spec.level_resolutions
        ]
    )  # (L, D)
    uses_hash = np.asarray(spec.level_uses_hash)  # (L,)
    return scales, strides, uses_hash


def _level_rows_frac_t(xt, scale, stride, uses_hash, spec: HashGridSpec):
    """Corner rows + interpolation fractions for ONE level, in N-minor
    (transposed) layout: every intermediate keeps the big point axis as the
    minor dimension.  TPU tiles the two minor dims to (8, 128); any array
    with a tiny minor dim (3, 4, 8...) is padded up to 128 lanes — a 32x
    memory/bandwidth blowup measured as multi-GB HLO temps.

    xt: (D, N).  Returns rows (C, N) int32 local to the level's slice,
    frac (D, N), offsets (C, D) numpy."""
    d = spec.n_input_dims
    t_mask = jnp.uint32(spec.table_entries_per_level - 1)
    pos = xt.astype(jnp.float32) * scale + 0.5  # (D, N)
    grid = jnp.floor(pos)
    frac = pos - grid
    grid_u = grid.astype(jnp.int32).astype(jnp.uint32)  # (D, N)
    offsets = _corner_offsets(d)  # (C, D) numpy

    c = 1 << d
    rows = []
    for ci in range(c):  # unrolled over the 2^D corners
        if uses_hash:
            r = (grid_u[0] + np.uint32(offsets[ci, 0])) * jnp.uint32(_PRIMES[0])
            for i in range(1, d):
                r = r ^ (
                    (grid_u[i] + np.uint32(offsets[ci, i]))
                    * jnp.uint32(_PRIMES[i])
                )
        else:
            r = (grid_u[0] + np.uint32(offsets[ci, 0])) * jnp.uint32(
                int(stride[0])
            )
            for i in range(1, d):
                r = r + (grid_u[i] + np.uint32(offsets[ci, i])) * jnp.uint32(
                    int(stride[i])
                )
        rows.append(r & t_mask)
    return jnp.stack(rows).astype(jnp.int32), frac, offsets


def _level_weights_t(frac, offsets):
    """Interpolation weights (C, N) from frac (D, N); per-corner unrolled so
    no (C, D, N) intermediate is materialized."""
    c, d = offsets.shape
    ws = []
    for ci in range(c):
        w = None
        for i in range(d):
            term = frac[i] if offsets[ci, i] == 1 else 1.0 - frac[i]
            w = term if w is None else w * term
        ws.append(w)
    return jnp.stack(ws)  # (C, N)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hashgrid_encode(
    table: jnp.ndarray,
    positions: jnp.ndarray,
    spec: HashGridSpec,
    needs_pos_grad: bool = True,
) -> jnp.ndarray:
    """Encode positions with a multi-resolution hash grid.

    Args:
        table: feature-major (F, L*T) parameter table.
        positions: (..., D) coordinates, expected in [0, 1] (the caller
            contracts/normalizes and zeroes out-of-box points).
    Returns:
        (..., L*F) encoded features, in the table's dtype.

    TPU design notes (all measured on v5e):
      * the table is FEATURE-MAJOR and gathers run along the minor (lane)
        axis: a features-minor gather output (N*C, 4) is tiled T(8,128) on
        TPU, padding 4 -> 128 lanes — 32x wasted HBM and a gather that is
        orders of magnitude slower (54 ms vs 105 s per level batch);
      * levels are processed in an UNROLLED python loop with STATIC table
        slices — a ``lax.scan`` with ``dynamic_slice`` forces XLA's slow
        gather path (70x slower forward for the 2^20-entry static grid);
      * per-level transients are (F, N, 2^D) — never all levels at once;
      * the custom VJP saves only ``(table, positions)`` and recomputes
        indices/weights in the backward, the tcnn-fused-kernel equivalent
        (default autodiff residuals were >16 GB HBM at the reference
        workload of 8192 rays x 64 samples x 7 hash queries per point);
      * position gradients (needed only for flow-warped queries) are
        computed only when ``needs_pos_grad``.
    """
    d = spec.n_input_dims
    f = spec.n_features_per_level
    t = spec.table_entries_per_level
    batch_shape = positions.shape[:-1]
    xt = positions.reshape(-1, d).T  # (D, N): N-minor from here on
    n = xt.shape[1]
    scales, strides, uses_hash = _level_constants(spec)

    outs = []
    for lvl in range(spec.n_levels):
        rows, frac, offsets = _level_rows_frac_t(
            xt, scales[lvl], strides[lvl], uses_hash[lvl], spec
        )  # rows (C, N)
        w = _level_weights_t(frac, offsets)  # (C, N)
        c = offsets.shape[0]
        flat_rows = rows.reshape(-1)  # (C*N,)
        w_flat = w.reshape(-1).astype(table.dtype)
        if spec.gather == "1d":
            # per-feature 1D gathers: no padded temps (a 2D (F, T)-operand
            # gather output materializes as [C*N, F] minor-F, padded
            # 4 -> 128 lanes: 4 GB temps at the reference workload)
            outs.append(
                jnp.stack(
                    [
                        (
                            jnp.take(
                                table[fi, lvl * t : (lvl + 1) * t], flat_rows,
                                mode="clip",
                            )
                            * w_flat
                        ).reshape(c, n).sum(0)
                        for fi in range(f)
                    ]
                )
            )  # (F, N)
        else:
            # single take per level is fastest, but its [C*N, F] gather
            # output is lane-padded F -> 128; chunk along N and serialize
            # with optimization_barrier so only one padded temp is live
            level_table = table[:, lvl * t : (lvl + 1) * t]
            parts = []
            prev = None
            for a, b in _n_chunks(n, c):
                rows_ch = rows[:, a:b].reshape(-1)
                if prev is not None:
                    rows_ch = jax.lax.optimization_barrier((rows_ch, prev))[0]
                feats_ch = jnp.take(level_table, rows_ch, axis=1, mode="clip")
                w_ch = w[:, a:b].reshape(-1).astype(table.dtype)
                part = jnp.stack(
                    [
                        (feats_ch[fi] * w_ch).reshape(c, b - a).sum(0)
                        for fi in range(f)
                    ]
                )  # (F, nb)
                parts.append(part)
                prev = part
            outs.append(
                parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
            )
    # (L, F, N) -> (N, L, F) -> (N, L*F)
    out = jnp.stack(outs, axis=0).transpose(2, 0, 1).reshape(n, -1)
    return out.reshape(*batch_shape, spec.n_output_dims)


def _hashgrid_fwd(table, positions, spec, needs_pos_grad):
    return (
        hashgrid_encode(table, positions, spec, needs_pos_grad),
        (table, positions),
    )


def _hashgrid_bwd(spec, needs_pos_grad, residuals, g):
    table, positions = residuals
    d = spec.n_input_dims
    f = spec.n_features_per_level
    t = spec.table_entries_per_level
    batch_shape = positions.shape[:-1]
    xt = positions.reshape(-1, d).T  # (D, N)
    n = xt.shape[1]
    # cotangent in feature-major layout: (N, L*F) -> (L, F, N)
    gl = g.reshape(n, spec.n_levels, f).astype(jnp.float32).transpose(1, 2, 0)
    scales, strides, uses_hash = _level_constants(spec)

    d_pos_t = jnp.zeros((d, n), jnp.float32)
    d_tables = []
    for lvl in range(spec.n_levels):
        g_l = gl[lvl]  # (F, N)
        rows, frac, offsets = _level_rows_frac_t(
            xt, scales[lvl], strides[lvl], uses_hash[lvl], spec
        )  # rows (C, N), frac (D, N)
        w = _level_weights_t(frac, offsets)  # (C, N)

        # dL/dtable: scatter-add g * w at the corner rows.  Unrolled per
        # feature: 1D scatters avoid the (C*N, F)-shaped scatter temps XLA
        # otherwise materializes F-minor (32x padded).
        flat_rows = rows.reshape(-1)  # (C*N,)
        c = offsets.shape[0]
        w_flat = w.reshape(-1)  # (C*N,)
        d_table_l = []
        for fi in range(f):
            upd = w_flat * jnp.tile(g_l[fi], c)  # (C*N,)
            d_table_l.append(jnp.zeros((t,), jnp.float32).at[flat_rows].add(upd))
        d_tables.append(jnp.stack(d_table_l))  # (F, T)

        if needs_pos_grad:
            # dL/dpositions through the weights:
            # dw_c/dfrac_i = (+/-) prod_{i' != i} term_i'
            # gdotf computed per feature on 2D (C*N,) buffers
            gdotf = jnp.zeros_like(w_flat)
            if spec.gather == "1d":
                for fi in range(f):
                    feats_fi = jnp.take(
                        table[fi, lvl * t : (lvl + 1) * t], flat_rows,
                        mode="clip",
                    ).astype(jnp.float32)
                    gdotf = gdotf + feats_fi * jnp.tile(g_l[fi], c)
            else:
                level_table = table[:, lvl * t : (lvl + 1) * t]
                gparts = []
                prev = None
                for a, b in _n_chunks(n, c):
                    rows_ch = rows[:, a:b].reshape(-1)
                    if prev is not None:
                        rows_ch = jax.lax.optimization_barrier(
                            (rows_ch, prev)
                        )[0]
                    feats_ch = jnp.take(
                        level_table, rows_ch, axis=1, mode="clip"
                    ).astype(jnp.float32)
                    gp = jnp.zeros((c * (b - a),), jnp.float32)
                    for fi in range(f):
                        gp = gp + feats_ch[fi] * jnp.tile(g_l[fi, a:b], c)
                    gparts.append(gp.reshape(c, b - a))
                    prev = gparts[-1]
                gdotf_2d = (
                    gparts[0] if len(gparts) == 1
                    else jnp.concatenate(gparts, axis=1)
                )
                gdotf = gdotf_2d.reshape(-1)
            gdotf = gdotf.reshape(c, n)  # (C, N)
            for i in range(d):  # unrolled: no (C, D, N) intermediate
                acc = None
                for ci in range(c):
                    dw = None  # prod over dims != i, signed by bit i
                    for i2 in range(d):
                        if i2 == i:
                            continue
                        term = (
                            frac[i2] if offsets[ci, i2] == 1 else 1.0 - frac[i2]
                        )
                        dw = term if dw is None else dw * term
                    if dw is None:
                        dw = jnp.ones_like(frac[i])
                    if offsets[ci, i] == 0:
                        dw = -dw
                    contrib = gdotf[ci] * dw
                    acc = contrib if acc is None else acc + contrib
                d_pos_t = d_pos_t.at[i].add(acc * scales[lvl])

    d_table = jnp.concatenate(d_tables, axis=1).astype(table.dtype)
    d_pos = d_pos_t.T.reshape(*batch_shape, d).astype(positions.dtype)
    return d_table, d_pos


hashgrid_encode.defvjp(_hashgrid_fwd, _hashgrid_bwd)
