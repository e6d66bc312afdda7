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
from dataclasses import dataclass
from functools import cached_property, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Spatial-hash primes from Instant-NGP (Teschner et al. hashing; prime_0 = 1
# so that the first dim is identity, as in tiny-cuda-nn).
_PRIMES = (1, 2654435761, 805459861, 3674653429)


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
        return (
            self.n_levels * self.table_entries_per_level,
            self.n_features_per_level,
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
    Used by tests as the oracle for the custom-VJP version below."""
    d = spec.n_input_dims
    batch_shape = positions.shape[:-1]
    x = positions.reshape(-1, d)
    rows, frac, offsets = _rows_frac(x, spec)
    w = _interp_weights(frac, offsets)
    feats = jnp.take(table, rows, axis=0)  # (N, L, C, F)
    out = (feats * w[..., None].astype(table.dtype)).sum(axis=2)  # (N, L, F)
    return out.reshape(*batch_shape, spec.n_output_dims)


def _level_constants(spec: HashGridSpec):
    """Per-level constant arrays consumed by the level scan."""
    d = spec.n_input_dims
    scales = jnp.asarray(spec.level_scales, dtype=jnp.float32)  # (L,)
    strides = jnp.asarray(
        np.stack(
            [
                np.asarray(
                    [(int(r) ** i) & 0xFFFFFFFF for i in range(d)],
                    dtype=np.uint32,
                )
                for r in spec.level_resolutions
            ]
        )
    )  # (L, D)
    uses_hash = jnp.asarray(spec.level_uses_hash)  # (L,)
    return scales, strides, uses_hash


def _level_rows_frac(x, scale, stride, uses_hash, spec: HashGridSpec):
    """Corner rows + interpolation fractions for ONE level.
    x (N, D); scale scalar; stride (D,) uint32; uses_hash scalar bool.
    Returns rows (N, C) int32 local to the level's table slice, frac (N, D)."""
    d = spec.n_input_dims
    t_mask = jnp.uint32(spec.table_entries_per_level - 1)
    pos = x.astype(jnp.float32) * scale + 0.5
    grid = jnp.floor(pos)
    frac = pos - grid
    offsets = jnp.asarray(_corner_offsets(d))  # (C, D)
    corners = grid.astype(jnp.int32)[:, None, :] + offsets[None, :, :]  # (N,C,D)
    cu = corners.astype(jnp.uint32)

    hashed = cu[..., 0] * jnp.uint32(_PRIMES[0])
    for i in range(1, d):
        hashed = hashed ^ (cu[..., i] * jnp.uint32(_PRIMES[i]))
    linear = (cu * stride[None, None, :]).sum(axis=-1, dtype=jnp.uint32)
    rows = (jnp.where(uses_hash, hashed, linear) & t_mask).astype(jnp.int32)
    return rows, frac, offsets


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hashgrid_encode(
    table: jnp.ndarray, positions: jnp.ndarray, spec: HashGridSpec
) -> jnp.ndarray:
    """Encode positions with a multi-resolution hash grid.

    Args:
        table: (L*T, F) parameter table.
        positions: (..., D) coordinates, expected in [0, 1] (the caller
            contracts/normalizes and zeroes out-of-box points).
    Returns:
        (..., L*F) encoded features, in the table's dtype.

    TPU memory design: both directions run a ``lax.scan`` over levels so the
    transient gather buffers are (N, 2^D, F) per level instead of
    (N, L, 2^D, F) for all levels at once, and the custom VJP saves only
    ``(table, positions)``, recomputing indices/weights in the backward.
    Plain autodiff of the batched version holds rows + weights + gathered
    features alive until the backward — gigabytes per field query at the
    reference workload (8192 rays x 64 samples x up to 7 hash queries per
    point).  This is the tcnn fused-kernel equivalent expressed in XLA.
    """
    d = spec.n_input_dims
    t = spec.table_entries_per_level
    batch_shape = positions.shape[:-1]
    x = positions.reshape(-1, d)
    n = x.shape[0]
    scales, strides, uses_hash = _level_constants(spec)

    def body(carry, level_args):
        lvl, scale, stride, uh = level_args
        rows, frac, offsets = _level_rows_frac(x, scale, stride, uh, spec)
        w = jnp.where(
            offsets[None, :, :] == 1, frac[:, None, :], 1.0 - frac[:, None, :]
        ).prod(axis=-1)  # (N, C)
        level_table = jax.lax.dynamic_slice_in_dim(table, lvl * t, t, axis=0)
        feats = jnp.take(level_table, rows, axis=0)  # (N, C, F)
        out_l = (feats * w[..., None].astype(table.dtype)).sum(axis=1)
        return carry, out_l

    _, ys = jax.lax.scan(
        body, None,
        (jnp.arange(spec.n_levels, dtype=jnp.int32), scales, strides, uses_hash),
    )  # ys: (L, N, F)
    out = jnp.moveaxis(ys, 0, 1).reshape(n, spec.n_output_dims)
    return out.reshape(*batch_shape, spec.n_output_dims)


def _hashgrid_fwd(table, positions, spec):
    return hashgrid_encode(table, positions, spec), (table, positions)


def _hashgrid_bwd(spec, residuals, g):
    table, positions = residuals
    d = spec.n_input_dims
    f = spec.n_features_per_level
    t = spec.table_entries_per_level
    batch_shape = positions.shape[:-1]
    x = positions.reshape(-1, d)
    n = x.shape[0]
    gl = g.reshape(n, spec.n_levels, f).astype(jnp.float32)  # (N, L, F)
    scales, strides, uses_hash = _level_constants(spec)

    def body(d_pos, level_args):
        lvl, scale, stride, uh, g_l = level_args  # g_l: (N, F)
        rows, frac, offsets = _level_rows_frac(x, scale, stride, uh, spec)
        terms = jnp.where(
            offsets[None, :, :] == 1, frac[:, None, :], 1.0 - frac[:, None, :]
        )  # (N, C, D)
        w = terms.prod(axis=-1)  # (N, C)

        # dL/dtable for this level: scatter-add g * w at the corner rows
        updates = (g_l[:, None, :] * w[..., None]).reshape(-1, f)
        d_table_l = (
            jnp.zeros((t, f), jnp.float32).at[rows.reshape(-1)].add(updates)
        )

        # dL/dpositions through the weights:
        # dw_c/dfrac_d = (+/-) prod_{d' != d} terms
        level_table = jax.lax.dynamic_slice_in_dim(table, lvl * t, t, axis=0)
        feats = jnp.take(level_table, rows, axis=0).astype(jnp.float32)
        gdotf = (feats * g_l[:, None, :]).sum(-1)  # (N, C)
        sign = jnp.where(offsets == 1, 1.0, -1.0)[None, :, :]
        dw = sign * _prod_excl(terms)  # (N, C, D)
        d_pos = d_pos + ((gdotf[..., None] * dw).sum(axis=1) * scale)
        return d_pos, d_table_l

    d_pos, d_tables = jax.lax.scan(
        body,
        jnp.zeros((n, d), jnp.float32),
        (
            jnp.arange(spec.n_levels, dtype=jnp.int32),
            scales, strides, uses_hash, jnp.moveaxis(gl, 0, 1),
        ),
    )
    d_table = d_tables.reshape(spec.table_shape).astype(table.dtype)
    return d_table, d_pos.reshape(*batch_shape, d).astype(positions.dtype)


def _prod_excl(terms):
    """prod over the last axis excluding each element, computed stably for
    zero entries via exclusive prefix/suffix products."""
    d = terms.shape[-1]
    ones = jnp.ones_like(terms[..., :1])
    pre = jnp.concatenate(
        [ones, jnp.cumprod(terms[..., :-1], axis=-1)], axis=-1
    )
    suf = jnp.concatenate(
        [jnp.flip(jnp.cumprod(jnp.flip(terms[..., 1:], -1), axis=-1), -1), ones],
        axis=-1,
    )
    return pre * suf


hashgrid_encode.defvjp(_hashgrid_fwd, _hashgrid_bwd)
