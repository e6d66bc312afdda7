"""MX grid: a scatter-free, MXU-native multiresolution encoder.

The measured wall for hash/brick grids on TPU is the table-gradient
scatter-add: row-rate-capped at ~45M rows/s regardless of width, dtype, or
duplicate structure (perf/microbench.py, PERF_NOTES).  The representation
-level answer (VERDICT r2 #1c) is an encoding whose backward is a MATMUL:

* coarse levels (dense, small): kept as a brick grid whose table gradient
  already lowers to one-hot MXU contractions (ops/brickgrid.py one-hot
  path) — the sub-spec is auto-sized so EVERY brick level fits the
  one-hot budget, i.e. no level ever scatters;
* fine levels: CP-factorized lines (TensoRF-style), with each line
  block-decomposed into a CLAMPED coarse line of ``line_block`` entries
  plus a PERIODIC line of ``line_block`` entries repeated
  ``res / line_block`` times (a learned carrier, the generalization of
  the sinusoidal PE the original NeRF uses for exactly these
  frequencies).  Both parts are evaluated as tent-weight matmuls
  ``W(c) @ T`` where ``W(c)[n, j] = relu(1 - dist(c_n, j))`` is built
  from a broadcasted iota — so the autodiff backward (``W^T @ g`` for
  the table cotangent) is a dense MXU matmul and the compiled program
  contains NO scatter.  Because every scale shares the same block
  geometry, all scales of an axis evaluate as ONE batched dot_general
  of shape ``(2*S, chunk, block) @ (2*S, block, R*F)``.

The axis feature is ``coarse(c) + periodic(c)``; a scale's feature is the
rank contraction of the axes' elementwise product
(``feat[f] = sum_r prod_a u_a[r, f]``), realized as a matmul with a
constant 0/1 rank-sum matrix (NOT an (n, R, F) reshape, whose tiny minor
dims cost an 8x lane-padding blowup on TPU).

Memory discipline: the encode runs as a ``lax.map`` over point chunks
with ``jax.checkpoint`` per chunk — residuals are the chunk coordinates
only, so peak HBM is one chunk's tent transients (vs 16.6 GB live for
the naive per-scale formulation at the flagship workload).

FLOPs instead of scatters: an axis costs ``2 * N * 2S * block * R*F``
MACs per chunk sweep — ~4 TFLOP/step at the flagship workload, a few
tens of ms on the MXU, vs ~470 ms/step of scatter-add for the brick
formulation it replaces.

The reference counterpart is the tcnn fused hash encoder
(/root/reference/third_party/tcnn_modules.py:115-263); this module matches
its ROLE (multiresolution positional features, L*F outputs) with a
representation chosen for the TPU's compute model instead of a CUDA
atomics port.  Capacity differs (rank-R low-rank + periodic carriers vs
hashed collisions): quality parity is gated by the same flagship A/B
machinery as every other TPU divergence (perf/quality_ab.py `mx*`
variants).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

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
    """Hybrid dense-brick + blocked-CP-line encoder, one flat parameter
    vector.

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
    # 4D grids: nominal resolution of the time axis lines
    time_resolution: int = 64
    # points per matmul chunk (tent transient is 2S x chunk x line_block)
    chunk: int = 8192
    # factor init std; a CP feature is a product of `spatial_dims` factors
    init_scale: float = 0.2
    # nominal line resolutions above this are clamped (caps the periodic
    # carrier frequency)
    max_line_resolution: int = 4096
    # entries per line block: every line = clamped coarse block + periodic
    # block at res/line_block periods
    line_block: int = 128

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

    def axis_freqs(self, axis: int) -> np.ndarray:
        """Periods of the periodic block per scale for one input axis
        (>= 1; a 1-period circular line is just extra coarse capacity)."""
        if self.has_time and axis == self.spatial_dims:
            res = np.full(self.n_scales, self.time_resolution, np.float64)
        else:
            res = self.factored_resolutions.astype(np.float64)
        return np.maximum(res / float(self.line_block), 1.0)

    @property
    def _axis_part(self) -> int:
        """Flat element count of ONE axis's line stack (coarse + periodic
        blocks for every factored scale)."""
        return 2 * self.n_scales * self.line_block * self.factor_width

    @property
    def _part_sizes(self) -> Tuple[int, ...]:
        """Flat element counts: [brick, axis0 lines, axis1 lines, ...]."""
        bspec = self.brick_spec
        sizes = [int(np.prod(bspec.table_shape)) if bspec else 0]
        sizes.extend([self._axis_part] * self.axes_per_scale)
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


def _rank_sum_matrix(spec: MXGridSpec) -> np.ndarray:
    """(R*F, F) 0/1 matrix: lane (r*F + f) -> output f.  Contracting the
    rank axis as a matmul keeps the point axis on full 128-lane tiles;
    the equivalent (n, R, F) reshape+sum pads its tiny minor dims 8x."""
    r, f = spec.rank, spec.n_features_per_level
    s = np.zeros((r * f, f), np.float32)
    s[np.arange(r * f), np.tile(np.arange(f), r)] = 1.0
    return s


def _axis_tent(coords, freqs: np.ndarray, block: int):
    """(chunk,) coords in [0,1] -> (2S, chunk, block) tent-weight stack:
    rows [0:S] the shared clamped coarse tent (broadcast — its extra dot
    FLOPs are inherent, and the broadcast costs fewer bytes than the
    relayout a separate unbatched coarse dot would need), rows [S:2S]
    the per-scale periodic (circular) tents at ``freqs`` periods.  Pure
    elementwise math over a broadcasted iota — no gather, no scatter."""
    s = len(freqs)
    chunk = coords.shape[0]
    c = coords.astype(jnp.float32)
    j = lax.broadcasted_iota(jnp.float32, (chunk, block), 1)
    # clamped coarse tent, resolution `block` (same for every scale)
    uc = c[:, None] * (block - 1)
    tent_c = jnp.maximum(0.0, 1.0 - jnp.abs(uc - j))
    tent_c = jnp.broadcast_to(tent_c[None], (s, chunk, block))
    # periodic tents: u in [0, block) at freq periods, circular distance
    fr = jnp.asarray(freqs, jnp.float32)[:, None, None]
    up = (c[None, :, None] * fr) % 1.0 * block
    d = jnp.abs(up - j[None])
    d = jnp.minimum(d, block - d)
    tent_p = jnp.maximum(0.0, 1.0 - d)
    return jnp.concatenate([tent_c, tent_p], axis=0)


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
        brick_tbl = lax.slice_in_dim(table, 0, sizes[0]).reshape(
            spec.brick_spec.table_shape
        )
        outs.append(
            brickgrid_encode(brick_tbl, x, spec.brick_spec, needs_pos_grad)
        )

    if spec.n_scales:
        w = spec.factor_width
        blk = spec.line_block
        ns = spec.n_scales
        naxes = spec.axes_per_scale
        # per-axis line stacks: (2S, block, W) — [0:S] coarse, [S:2S]
        # periodic, matching the tent stack order
        axis_tbls = []
        off = sizes[0]
        for a in range(naxes):
            axis_tbls.append(
                lax.slice_in_dim(table, off, off + sizes[1 + a]).reshape(
                    2 * ns, blk, w
                )
            )
            off += sizes[1 + a]
        freqs = [spec.axis_freqs(a) for a in range(naxes)]
        rs = jnp.asarray(_rank_sum_matrix(spec))

        chunk = min(spec.chunk, max(n, 1))
        nchunks = -(-n // chunk)
        xp = jnp.pad(x, ((0, nchunks * chunk - n), (0, 0))).reshape(
            nchunks, chunk, d
        )
        if not needs_pos_grad:
            xp = lax.stop_gradient(xp)

        def one_chunk(c):
            """(chunk, d) -> (chunk, n_scales * F).  Residuals under
            checkpoint: c (and the table slices) only — tent transients
            are rebuilt in the backward, bounding peak HBM to one
            chunk's working set."""
            prod = None
            for a in range(naxes):
                tbl = axis_tbls[a]
                tent = _axis_tent(c[:, a], freqs[a], blk)
                u2 = lax.dot_general(
                    tent.astype(tbl.dtype),
                    tbl,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (2S, chunk, W)
                u = u2[:ns] + u2[ns:]  # coarse + periodic, (S, chunk, W)
                prod = u if prod is None else prod * u
            feat = lax.dot_general(
                prod, rs, (((2,), (0,)), ((), ()))
            )  # (S, chunk, F)
            return feat.transpose(1, 0, 2).reshape(chunk, ns * f)

        body = jax.checkpoint(one_chunk)
        if nchunks == 1:
            fac = body(xp[0])
        else:
            fac = lax.map(body, xp).reshape(nchunks * chunk, ns * f)
        outs.append(fac[:n])

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
    if spec.n_scales:
        w = spec.factor_width
        blk = spec.line_block
        ns = spec.n_scales
        off = sizes[0]

        def lerp_clamped(tbl, c):
            # tbl (blk, w), c (n,) -> (n, w)
            u = c.astype(jnp.float32) * (blk - 1)
            i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, blk - 1)
            i1 = jnp.clip(i0 + 1, 0, blk - 1)
            fr = (u - i0.astype(jnp.float32))[:, None]
            return tbl[i0] * (1 - fr) + tbl[i1] * fr

        def lerp_periodic(tbl, c, freq):
            u = (c.astype(jnp.float32) * freq) % 1.0 * blk
            i0 = jnp.floor(u).astype(jnp.int32) % blk
            i1 = (i0 + 1) % blk
            fr = (u - jnp.floor(u))[:, None]
            return tbl[i0] * (1 - fr) + tbl[i1] * fr

        prods = [None] * ns
        for a in range(spec.axes_per_scale):
            stack = table[off: off + sizes[1 + a]].reshape(2 * ns, blk, w)
            off += sizes[1 + a]
            freqs = spec.axis_freqs(a)
            for s in range(ns):
                u = lerp_clamped(stack[s], x[:, a]) + lerp_periodic(
                    stack[ns + s], x[:, a], float(freqs[s])
                )
                prods[s] = u if prods[s] is None else prods[s] * u
        for s in range(ns):
            outs.append(prods[s].reshape(n, spec.rank, f).sum(axis=1))
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(*batch_shape, spec.n_output_dims)
