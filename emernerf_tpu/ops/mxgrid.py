"""MX grid: a scatter-free, MXU-native multiresolution encoder.

The measured wall for hash/brick grids on TPU is the table-gradient
scatter-add: row-rate-capped at ~45M rows/s regardless of width, dtype, or
duplicate structure (perf/microbench.py, PERF_NOTES).  The representation
-level answer (VERDICT r2 #1c) is an encoding whose backward is a MATMUL:

* coarse levels (dense, small): kept as a brick grid whose table gradient
  already lowers to one-hot MXU contractions (ops/brickgrid.py one-hot
  path) — the sub-spec is auto-sized so EVERY brick level fits the
  one-hot budget, i.e. no level ever scatters;
* fine levels: CP-factorized lines (TensoRF-style).  Per scale ``s`` and
  input axis ``a`` a line table ``T_sa`` of shape ``(res_s, R*F)``; the
  axis feature is ``W(c) @ T_sa`` where ``W(c)[n, j] =
  relu(1 - |c_n*(res-1) - j|)`` is the linear-interpolation tent weight
  built by an iota compare — a pure elementwise producer that fuses into
  the dot operand.  The scale's feature is the rank-sum of the axes'
  elementwise product: ``feat_s[f] = sum_r prod_a U_sa[r, f]``.  Both the
  forward and the autodiff backward (``W^T @ g`` for the table cotangent)
  are dense MXU matmuls; position gradients flow through the tent weights.

FLOPs instead of scatters: one axis-scale costs ``2*N*res_s*R*F`` MACs —
at the training workload (N~2.6M, res<=4096, R*F=64) a few ms on the MXU
per scale, vs hundreds of ms of scatter for the equivalent hash levels.

The reference counterpart is the tcnn fused hash encoder
(/root/reference/third_party/tcnn_modules.py:115-263); this module matches
its ROLE (multiresolution positional features, L*F outputs) with a
representation chosen for the TPU's compute model instead of a CUDA
atomics port.  Capacity differs (rank-R low-rank vs hashed collisions):
quality parity is gated by the same flagship A/B machinery as every other
TPU divergence (perf/quality_ab.py `mx*` variants).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from emernerf_tpu.ops.brickgrid import (
    BrickGridSpec,
    brickgrid_encode,
    init_brickgrid_table,
)

# keep every brick level's one-hot contraction at or under this many
# table elements (rows * row_width); matches ops/brickgrid.py's default
# onehot budget so no brick level ever takes the scatter path
_ONEHOT_BUDGET = 1 << 19


@dataclasses.dataclass(frozen=True)
class MXGridSpec:
    """Hybrid dense-brick + CP-line encoder, one flat parameter vector.

    The level hierarchy mirrors an L-level hash grid (same growth factor
    between ``base_resolution`` and ``max_resolution``); the first
    ``n_brick_levels`` levels (auto: all levels whose dense brick table
    fits the one-hot budget) are a brick grid, the rest are factored
    scales.  ``n_output_dims`` = n_levels * n_features_per_level, so it is
    a drop-in for HashGridSpec/BrickGridSpec in the fields.
    """

    n_input_dims: int
    n_levels: int
    base_resolution: int
    max_resolution: int
    n_features_per_level: int
    rank: int = 16
    # 4D grids: resolution of the time axis lines
    time_resolution: int = 64
    # points per matmul chunk (transient is chunk x max line res)
    chunk: int = 8192
    # factor init std; a CP feature is a product of `spatial_dims` factors
    init_scale: float = 0.2
    # line tables longer than this are clamped (tent-matmul cost ~ res)
    max_line_resolution: int = 4096

    # ---- hierarchy geometry (matches brickgrid's level ladder) ----
    @property
    def growth_factor(self) -> float:
        if self.n_levels <= 1:
            return 1.0
        return float(
            np.exp(
                (np.log(self.max_resolution) - np.log(self.base_resolution))
                / (self.n_levels - 1)
            )
        )

    @property
    def level_resolutions(self) -> np.ndarray:
        b = self.growth_factor
        return np.array(
            [
                int(np.floor(self.base_resolution * b**l))
                for l in range(self.n_levels)
            ],
            dtype=np.int64,
        )

    @property
    def spatial_dims(self) -> int:
        return min(self.n_input_dims, 3)

    @property
    def has_time(self) -> bool:
        return self.n_input_dims == 4

    def _make_brick(self, nb: int) -> BrickGridSpec:
        res = self.level_resolutions
        f = self.n_features_per_level
        bs = 2 if f == 1 and self.n_input_dims == 3 else 1
        spec = BrickGridSpec(
            n_input_dims=self.n_input_dims,
            n_levels=nb,
            base_resolution=self.base_resolution,
            max_resolution=int(res[nb - 1]),
            log2_bricks=4,
            n_features_per_level=f,
            log2_brick_size=bs,
            time_pair=self.has_time,
            onehot_budget=_ONEHOT_BUDGET,
        )
        # capacity >= the dense cell count of every level (time axis
        # included) so no level hashes; the one-hot contraction then
        # covers each level's full (dense) slice exactly
        need = 1
        for li in range(nb):
            cells = int(spec.brick_resolutions[li]) ** spec.spatial_dims
            if spec.has_time:
                t = int(spec.level_resolutions[li])
                cells *= t if spec.uses_time_pair else t + 1
            need = max(need, cells)
        return dataclasses.replace(
            spec, log2_bricks=max(int(np.ceil(np.log2(need))), 4)
        )

    @property
    def n_brick_levels(self) -> int:
        """Largest level prefix that stays DENSE and under the one-hot
        budget as a brick grid (=> table grads are MXU contractions, no
        scatter).  0 when even level 0 exceeds it (e.g. wide-F 4D grids,
        where the time axis multiplies the dense row count)."""
        best = 0
        for nb in range(1, self.n_levels):  # keep >= 1 factored scale
            spec = self._make_brick(nb)
            ok = not spec.level_uses_hash.any() and bool(
                (spec.level_rows * spec.row_width <= _ONEHOT_BUDGET).all()
            )
            if not ok:
                break
            best = nb
        return best

    @property
    def brick_spec(self):
        nb = self.n_brick_levels
        return self._make_brick(nb) if nb else None

    @property
    def factored_resolutions(self) -> np.ndarray:
        return np.minimum(
            self.level_resolutions[self.n_brick_levels:],
            self.max_line_resolution,
        )

    @property
    def n_scales(self) -> int:
        return self.n_levels - self.n_brick_levels

    @property
    def factor_width(self) -> int:
        return self.rank * self.n_features_per_level

    @property
    def axes_per_scale(self) -> int:
        return self.spatial_dims + (1 if self.has_time else 0)

    @property
    def _part_sizes(self) -> Tuple[int, ...]:
        """Flat element counts: [brick, (scale0 ax0), (scale0 ax1), ...]."""
        bspec = self.brick_spec
        sizes = [int(np.prod(bspec.table_shape)) if bspec else 0]
        w = self.factor_width
        for res in self.factored_resolutions:
            for a in range(self.axes_per_scale):
                r = self.time_resolution if (
                    self.has_time and a == self.spatial_dims
                ) else int(res)
                sizes.append(r * w)
        return tuple(sizes)

    @property
    def num_parameters(self) -> int:
        return sum(self._part_sizes)

    @property
    def table_shape(self) -> Tuple[int]:
        # pad to a multiple of 1024 so ZeRO reduce-scatter shards evenly
        n = self.num_parameters
        return (-(-n // 1024) * 1024,)

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level

    @property
    def level_scales(self) -> np.ndarray:
        return self.level_resolutions.astype(np.float64)


def init_mxgrid_table(key, spec: MXGridSpec, dtype=jnp.float32, scale=1e-4):
    """Brick part: uniform(-scale, scale) like the hash tables.  Factor
    parts: normal(spec.init_scale) — a CP feature is a PRODUCT of
    ``axes_per_scale`` factors, so per-factor magnitude ~0.2 yields
    feature magnitudes ~1e-3..1e-2, matching the hash-grid init regime."""
    sizes = spec._part_sizes
    k_brick, k_fact = jax.random.split(key)
    parts = []
    if spec.brick_spec is not None:
        parts.append(
            init_brickgrid_table(
                k_brick, spec.brick_spec, dtype=dtype, scale=scale
            ).reshape(-1)
        )
    parts.append(
        spec.init_scale
        * jax.random.normal(k_fact, (sum(sizes[1:]),), dtype)
    )
    flat = jnp.concatenate(parts)
    pad = spec.table_shape[0] - flat.shape[0]
    return jnp.pad(flat, (0, pad))


def _tent_matmul(tbl, coords, res: int, chunk: int):
    """(N,) coords in [0,1] x (res, W) table -> (N, W) linearly
    interpolated rows, as chunked dense matmuls.

    The tent weight matrix W[n, j] = relu(1 - |c_n*(res-1) - j|) has the
    two linear-interp weights on the bracketing integer lanes and zeros
    elsewhere; built from a broadcasted iota it is a pure elementwise
    producer.  jax.checkpoint keeps it out of the residuals — the
    backward rebuilds it per chunk and emits W^T @ g (a matmul) as the
    table cotangent.  Differentiable in ``coords`` through the tent."""
    n = coords.shape[0]
    w = tbl.shape[-1]
    nchunks = -(-n // chunk)
    pad = nchunks * chunk - n
    c = jnp.pad(coords, (0, pad)).reshape(nchunks, chunk)

    @jax.checkpoint
    def one(c_chunk, tbl):
        u = c_chunk.astype(jnp.float32) * (res - 1)
        j = jax.lax.broadcasted_iota(jnp.float32, (chunk, res), 1)
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - j))
        return jax.lax.dot_general(
            wgt.astype(tbl.dtype), tbl,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if nchunks == 1:
        out = one(c[0], tbl)
    else:
        out = jax.lax.map(lambda cc: one(cc, tbl), c).reshape(
            nchunks * chunk, w
        )
    return out[:n]


def mxgrid_encode(
    table: jnp.ndarray,
    positions: jnp.ndarray,
    spec: MXGridSpec,
    needs_pos_grad: bool = True,
) -> jnp.ndarray:
    """Encode positions ((..., D) in [0,1]) -> (..., n_levels * F).

    Plain autodiff: the brick sub-encode has its own custom VJP (one-hot
    only, by construction), and every factored op is matmul/elementwise,
    so the derived backward contains NO scatter."""
    d = spec.n_input_dims
    f = spec.n_features_per_level
    batch_shape = positions.shape[:-1]
    x = positions.reshape(-1, d)
    n = x.shape[0]
    sizes = spec._part_sizes

    # coarse dense levels
    outs = []
    if spec.brick_spec is not None:
        brick_tbl = jax.lax.slice_in_dim(table, 0, sizes[0]).reshape(
            spec.brick_spec.table_shape
        )
        outs.append(
            brickgrid_encode(brick_tbl, x, spec.brick_spec, needs_pos_grad)
        )

    # factored scales
    w = spec.factor_width
    off = sizes[0]
    part = 1
    for s, res in enumerate(spec.factored_resolutions):
        prod = None
        for a in range(spec.axes_per_scale):
            is_time = spec.has_time and a == spec.spatial_dims
            r = spec.time_resolution if is_time else int(res)
            tbl = jax.lax.slice_in_dim(
                table, off, off + sizes[part]
            ).reshape(r, w)
            off += sizes[part]
            part += 1
            coords = x[:, a]
            if not needs_pos_grad:
                coords = jax.lax.stop_gradient(coords)
            u = _tent_matmul(tbl, coords, r, spec.chunk)  # (N, R*F)
            prod = u if prod is None else prod * u
        feat = prod.reshape(n, spec.rank, f).sum(axis=1)  # rank contraction
        outs.append(feat)

    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(*batch_shape, spec.n_output_dims)


def mxgrid_encode_ref(table, positions, spec: MXGridSpec):
    """Naive per-point reference (gather-based lerp) for tests."""
    d = spec.n_input_dims
    f = spec.n_features_per_level
    batch_shape = positions.shape[:-1]
    x = positions.reshape(-1, d)
    n = x.shape[0]
    sizes = spec._part_sizes
    outs = []
    if spec.brick_spec is not None:
        brick_tbl = table[: sizes[0]].reshape(spec.brick_spec.table_shape)
        outs.append(brickgrid_encode(brick_tbl, x, spec.brick_spec, True))
    w = spec.factor_width
    off = sizes[0]
    part = 1
    for s, res in enumerate(spec.factored_resolutions):
        prod = None
        for a in range(spec.axes_per_scale):
            is_time = spec.has_time and a == spec.spatial_dims
            r = spec.time_resolution if is_time else int(res)
            tbl = table[off: off + sizes[part]].reshape(r, w)
            off += sizes[part]
            part += 1
            u = x[:, a].astype(jnp.float32) * (r - 1)
            i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, r - 1)
            i1 = jnp.clip(i0 + 1, 0, r - 1)
            fr = (u - i0.astype(jnp.float32))[:, None]
            row = tbl[i0] * (1 - fr) + tbl[i1] * fr
            prod = row if prod is None else prod * row
        outs.append(prod.reshape(n, spec.rank, f).sum(axis=1))
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(*batch_shape, spec.n_output_dims)
