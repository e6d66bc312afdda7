"""Brick-grid hash encoding: the TPU-native row-count fix for hash grids.

TPU random access is ROW-RATE-bound (~110-150M gathered rows/s on v5e
regardless of row width up to ~128 lanes — perf/microbench.py), so the
classic Instant-NGP layout (8 narrow corner gathers per point-level, as in
ops/hashgrid.py / tiny-cuda-nn, reference third_party/tcnn_modules.py) is
8x off the achievable rate.  A brick grid stores a 2x2x2-CELL brick —
3x3x3 = 27 corner feature vectors — contiguously in one table row, so each
(point, level) query is ONE wide gather:

  cell   = floor(x * scale + 0.5);  frac in [0,1)
  brick  = cell >> 1;   o = cell & 1          (cell's position in its brick)
  row    = spatial_hash(brick) (or linear index when the brick grid fits)
  corner (i,j,k) of the cell lives at brick-local (o+i, o+j, o+k) ∈ {0,1,2}^3

Trilinear interpolation becomes a FACTORIZED weighting over the 27 brick
corners: per axis the weight over local positions {0,1,2} is
  w[p] = (p == o) * (1-f) + (p == o+1) * f
and W27 = wx ⊗ wy ⊗ wz (8 nonzero of 27) — all dense vector math, no
per-point lane selection.  4D (space-time) grids brick space only; by
default (``time_pair=True`` from the builders) a row additionally stores
BOTH time corners (t and t+1) of its time cell side by side, so a 4D
query is ONE 2x27F-lane gather instead of two 27F gathers — gathers are
row-rate-bound, so halving rows ~halves the encode (and its backward
scatter).  With ``time_pair=False`` 4D gathers two rows (t and t+1) and
lerps.

The cost is parameter duplication (27/8 per cell spatially, 2x in time
for pair rows) and C0 continuity only within bricks (field kinks at brick
planes / time-cell boundaries) — quality must be checked against the
exact hash on a synthetic scene (tests/test_brickgrid.py and the
PSNR-parity bench).

Backward: custom VJP recomputes indices/weights and scatters table grads
in one of several measured formulations (EMERNERF_SCATTER): "flat" narrow
per-corner scatters into the flattened table, or "wide" whole-row
scatter-adds.  Position gradients (needed only for flow-warped queries)
use forward-saved per-axis reductions by default (EMERNERF_POSGRAD=fwd:
(N, L, (D+1)F) residuals written once in the forward — ~1.5ms of HBM
traffic) instead of re-gathering every row in the backward
(EMERNERF_POSGRAD=regather: ~42M extra rows/step at the reference
workload).
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

# Instant-NGP spatial-hash primes (prime_0 = 1, as in tiny-cuda-nn)
_PRIMES = (1, 2654435761, 805459861, 3674653429)


def _env_override(var: str, default: str) -> str:
    """Perf formulations are SPEC FIELDS (captured by config snapshots —
    a run's numerics are reproducible from its saved config.yaml alone);
    the EMERNERF_* env vars remain as a debug escape hatch only."""
    return os.environ.get(var, default)


@dataclass(frozen=True)
class BrickGridSpec:
    """Static description of a brick-grid encoder.

    Level scales/resolutions are defined over CELLS exactly like
    ops/hashgrid.py:HashGridSpec (Instant-NGP geometric growth), so a brick
    grid is a drop-in replacement for the same hyperparameters.
    ``log2_bricks`` sizes each level's brick table; with bricks of 2^D
    cells, cell capacity per level is ``2^(log2_bricks + D)`` (spatial
    dims only for 4D).
    """

    n_input_dims: int = 3
    n_levels: int = 16
    base_resolution: int = 16
    max_resolution: int = 2048
    log2_bricks: int = 16
    n_features_per_level: int = 2
    # cells per axis inside one brick = 2^log2_brick_size (1 -> 2x2x2
    # bricks, 27-corner rows; 2 -> 4x4x4 bricks, 125-corner rows — the
    # latter fills the 128-lane tile exactly for F=1 proposal grids)
    log2_brick_size: int = 1
    # 4D only: store both time corners (t, t+1) of a time cell in one row
    # (2x row width, 2x parameters) so each (point, level) query is ONE
    # gather instead of two — gathers are row-rate-bound on TPU
    time_pair: bool = False
    # ---- measured-formulation knobs (config-visible; EMERNERF_SCATTER /
    # EMERNERF_REDUCE / EMERNERF_POSGRAD env vars override for debugging).
    # scatter_mode: "wide" = one (N, 27F)-row scatter-add per (level,
    # slice) (~45-52M rows/s on v5e); "flat" = narrow per-lane scatters
    # (tests/tiny models).
    scatter_mode: str = "wide"
    # reduce_mode: "unroll" = per-corner lane-slice MACs (avoids the
    # (N, C, F) relayout copy); "einsum" lets XLA pick the layout; "dot" =
    # lane-decoded weight row x constant (CF, F) selection matrix on the
    # MXU — einsum-level op count (3.3x fewer traced eqns than unroll,
    # perf/hlo_size.py) without the relayout copy.
    reduce_mode: str = "unroll"
    # posgrad_mode: "fwd" = forward-saved per-axis reductions;
    # "regather" = re-gather rows in the backward (frugal residuals,
    # ~42M extra rows/step at the reference workload).
    posgrad_mode: str = "fwd"
    # table grads of DENSE levels whose slice is small take the one-hot
    # MXU route instead of a scatter-add when
    # level_rows * row_width <= onehot_budget (exact same math, fp32
    # accumulation; measured on v5e: T=512/W=108 816M rows/s vs the 72M
    # scatter wall, T=4096 167M, two bf16 passes -> budget 2^19 stays strictly faster than the scatter at all widths —
    # perf/bench_scatter_alts.py).  0 disables.
    onehot_budget: int = 1 << 19
    # scatter table grads of HASHED levels from a 1/k strided point
    # subsample, scaled by k (unbiased in expectation; the stride phase is
    # derived from the batch's position bits so it varies per step).
    # Measured: k=4 1.7-2.0x, k=8 3.5x on the fused-grid scatter.  An
    # APPROXIMATION — quality-gated by tests/test_brickgrid.py parity
    # runs; 1 disables (default).
    grad_subsample: int = 1
    # COARSE VIEW: encode only the leading ``view_levels`` levels (0 = all).
    # Level geometry (growth factor, scales, resolutions, hash flags) still
    # derives from the FULL ``n_levels``, so level ``l < view_levels`` is
    # bit-identical to the same level of the full spec — the table for a
    # view is simply ``lax.slice_in_dim(full_table, 0, view_levels * B)``.
    # Used by footprint-based fine-level skipping (DensityField): far
    # samples whose pixel footprint exceeds the fine cells' size query a
    # coarse view, cutting gather AND scatter rows.
    view_levels: int = 0

    @property
    def scatter(self) -> str:
        return _env_override("EMERNERF_SCATTER", self.scatter_mode)

    @property
    def reduce(self) -> str:
        return _env_override("EMERNERF_REDUCE", self.reduce_mode)

    @property
    def posgrad(self) -> str:
        return _env_override("EMERNERF_POSGRAD", self.posgrad_mode)

    @property
    def onehot(self) -> int:
        return int(_env_override("EMERNERF_ONEHOT", str(self.onehot_budget)))

    @property
    def grad_sub(self) -> int:
        return int(_env_override("EMERNERF_GRAD_SUB", str(self.grad_subsample)))

    @property
    def brick_cells(self) -> int:
        return 1 << self.log2_brick_size

    @property
    def CPA(self) -> int:
        """Corners per axis inside one brick."""
        return self.brick_cells + 1

    @property
    def spatial_dims(self) -> int:
        return min(self.n_input_dims, 3)

    @property
    def has_time(self) -> bool:
        return self.n_input_dims == 4

    @property
    def corners_per_brick(self) -> int:
        return self.CPA ** self.spatial_dims  # 27 (3D) / 27 (4D, space only)

    @property
    def uses_time_pair(self) -> bool:
        return self.has_time and self.time_pair

    @property
    def row_width(self) -> int:
        w = self.corners_per_brick * self.n_features_per_level
        return 2 * w if self.uses_time_pair else w

    @property
    def bricks_per_level(self) -> int:
        return 1 << self.log2_bricks

    @property
    def n_levels_used(self) -> int:
        """Levels actually encoded: ``view_levels`` when set, else all."""
        return self.view_levels or self.n_levels

    @property
    def table_shape(self) -> Tuple[int, int]:
        """(L * B, 27*F): row-major, one brick per row.  Row width 108
        (F=4) pads to 128 lanes — 18% waste vs the 32x penalty of
        features-minor narrow layouts."""
        return (self.n_levels_used * self.bricks_per_level, self.row_width)

    @property
    def n_output_dims(self) -> int:
        return self.n_levels_used * self.n_features_per_level

    @property
    def num_parameters(self) -> int:
        return self.table_shape[0] * self.table_shape[1]

    @cached_property
    def growth_factor(self) -> float:
        if self.n_levels <= 1:
            return 1.0
        return math.exp(
            (math.log(self.max_resolution) - math.log(self.base_resolution))
            / (self.n_levels - 1)
        )

    @cached_property
    def level_scales(self) -> np.ndarray:
        log2g = math.log2(self.growth_factor)
        return np.asarray(
            [
                math.exp2(lv * log2g) * self.base_resolution - 1.0
                for lv in range(self.n_levels)
            ],
            dtype=np.float64,
        )

    @cached_property
    def level_resolutions(self) -> np.ndarray:
        """Cell-grid resolutions (corners per axis), as in HashGridSpec."""
        return np.asarray(
            [int(math.ceil(s)) + 1 for s in self.level_scales], dtype=np.int64
        )

    @cached_property
    def brick_resolutions(self) -> np.ndarray:
        """Bricks per axis: cell coord c -> brick coord c >> log2_brick_size."""
        return np.asarray(
            [
                ((int(r) - 1) >> self.log2_brick_size) + 1
                for r in self.level_resolutions
            ],
            dtype=np.int64,
        )

    @cached_property
    def level_uses_hash(self) -> np.ndarray:
        """True when the (spatial [* time]) brick grid exceeds the table."""
        b = self.bricks_per_level
        out = []
        for r in self.brick_resolutions:
            cells = int(r) ** self.spatial_dims
            if self.has_time:
                # time axis is unbricked cell resolution
                cells *= int(self.level_resolutions[len(out)])
            out.append(cells > b)
        return np.asarray(out, dtype=bool)

    @cached_property
    def level_rows(self) -> np.ndarray:
        """Addressable rows per level: the dense brick-grid size for dense
        levels, the full table slice for hashed ones.  Unpaired 4D levels
        also address time slot ``t+1`` (the upper lerp corner), hence the
        ``res + 1`` time count — those top rows wrap into the slice via
        the row mask in scatter mode, but a one-hot contraction must cover
        them explicitly."""
        b = self.bricks_per_level
        out = []
        for li, r in enumerate(self.brick_resolutions):
            cells = int(r) ** self.spatial_dims
            if self.has_time:
                t_count = int(self.level_resolutions[li])
                if not self.uses_time_pair:
                    t_count += 1
                cells *= t_count
            out.append(min(cells, b))
        return np.asarray(out, dtype=np.int64)


def init_brickgrid_table(key, spec: BrickGridSpec, dtype=jnp.float32,
                         scale=1e-4):
    """U(-1e-4, 1e-4), matching tcnn's hash-table init."""
    return jax.random.uniform(
        key, spec.table_shape, dtype=dtype, minval=-scale, maxval=scale
    )


def _level_constants(spec: BrickGridSpec):
    d = spec.spatial_dims
    scales = np.asarray(spec.level_scales, dtype=np.float32)
    bres = spec.brick_resolutions
    # linear strides over the brick grid (+ time as the slowest axis)
    strides = []
    for li, r in enumerate(bres):
        s = [(int(r) ** i) & 0xFFFFFFFF for i in range(d)]
        if spec.has_time:
            s.append((int(r) ** d) & 0xFFFFFFFF)  # time stride
        strides.append(s)
    return scales, np.asarray(strides, dtype=np.uint32), np.asarray(
        spec.level_uses_hash
    )


def _brick_rows(spec: BrickGridSpec, brick_u, t_cell_u, lvl: int,
                strides, uses_hash):
    """Rows (local to the level's table slice) for brick coords.

    brick_u: list of D (N,) uint32 arrays; t_cell_u: (N,) uint32 or None.
    """
    d = spec.spatial_dims
    mask = jnp.uint32(spec.bricks_per_level - 1)
    if uses_hash[lvl]:
        r = brick_u[0] * jnp.uint32(_PRIMES[0])
        for i in range(1, d):
            r = r ^ (brick_u[i] * jnp.uint32(_PRIMES[i]))
        if t_cell_u is not None:
            r = r ^ (t_cell_u * jnp.uint32(_PRIMES[3]))
    else:
        r = brick_u[0] * jnp.uint32(int(strides[lvl][0]))
        for i in range(1, d):
            r = r + brick_u[i] * jnp.uint32(int(strides[lvl][i]))
        if t_cell_u is not None:
            r = r + t_cell_u * jnp.uint32(int(strides[lvl][d]))
    return (r & mask).astype(jnp.int32)


def _axis_weights(o, f, cpa: int = 3):
    """Per-axis weights over brick-local corner positions {0..cpa-1} as ONE
    (cpa, N) array (N-minor — the measured-fast layout for narrow data).

    o: (N,) float cell offset inside the brick (0..cpa-2); f: (N,)
    fraction.  w[p] = (p == o) (1-f) + (p == o+1) f, evaluated densely —
    each position is the cell's lower corner, upper corner, or zero.
    Vectorized over p: the unrolled per-corner form traced thousands of
    small (N,) ops across levels x encode sites and dominated TPU compile
    time (~18 min for the flagship train step)."""
    p = jnp.arange(cpa, dtype=o.dtype)[:, None]  # (cpa, 1)
    lo = jnp.where(o[None, :] == p, 1.0 - f[None, :], 0.0)
    hi = jnp.where(o[None, :] == p - 1.0, f[None, :], 0.0)
    return lo + hi  # (cpa, N)


def _axis_dweights(o, cpa: int = 3):
    """d(w[p])/df per position (depends only on o), as (cpa, N)."""
    p = jnp.arange(cpa, dtype=o.dtype)[:, None]
    return jnp.where(o[None, :] == p, -1.0, 0.0) + jnp.where(
        o[None, :] == p - 1.0, 1.0, 0.0
    )


def _level_geometry(spec: BrickGridSpec, xt, tt, lvl, scales, strides,
                    uses_hash):
    """Per-level index/fraction computation, all in N-minor 1D arrays.

    xt: (D, N) spatial coords in [0,1]; tt: (N,) time or None.
    Returns rows (N,) int32 (level-local; 4D: tuple of two row arrays),
    per-axis (o, f) pairs, and time fraction (or None)."""
    d = spec.spatial_dims
    pos = [xt[i] * scales[lvl] + 0.5 for i in range(d)]
    cell = [jnp.floor(p) for p in pos]
    frac = [p - c for p, c in zip(pos, cell)]
    cell_i = [c.astype(jnp.int32) for c in cell]
    bs = spec.log2_brick_size
    off = [(c & (spec.brick_cells - 1)).astype(jnp.float32) for c in cell_i]
    brick_u = [(c >> bs).astype(jnp.uint32) for c in cell_i]

    if spec.has_time:
        tpos = tt * scales[lvl] + 0.5
        t_cell = jnp.floor(tpos)
        t_frac = tpos - t_cell
        t_u = t_cell.astype(jnp.int32).astype(jnp.uint32)
        rows0 = _brick_rows(spec, brick_u, t_u, lvl, strides, uses_hash)
        if spec.uses_time_pair:
            # one row holds both time corners of the cell
            return (rows0,), list(zip(off, frac)), t_frac
        rows1 = _brick_rows(
            spec, brick_u, t_u + jnp.uint32(1), lvl, strides, uses_hash
        )
        return (rows0, rows1), list(zip(off, frac)), t_frac
    rows = _brick_rows(spec, brick_u, None, lvl, strides, uses_hash)
    return (rows,), list(zip(off, frac)), None


def _outer_corners(mats, cpa: int):
    """D per-axis (cpa, N) weight matrices -> (C, N) corner weights with
    axis 0's digit FASTEST in the corner index (c = sum_i digit_i cpa^i),
    matching the table's corner-major row layout.  Two broadcasts instead
    of C unrolled product chains."""
    acc = mats[-1]
    n = acc.shape[-1]
    for m in mats[-2::-1]:
        # new[x*cpa + p] = acc[x] * m[p]: m's digit is faster than acc's
        acc = (acc[:, None, :] * m[None, :, :]).reshape(-1, n)
    return acc


def _corner_weights(spec: BrickGridSpec, axes):
    """All corner weights as ONE (C, N) array (vectorized outer product of
    the per-axis weight triples; the analytically-zero corners are densely
    computed — pure VPU math, no lane selection)."""
    ws = [_axis_weights(o, f, spec.CPA) for o, f in axes]  # D x (cpa, N)
    return _outer_corners(ws, spec.CPA)


def _corner_dweights(spec: BrickGridSpec, axes, axis_i: int):
    """Corner weight derivatives d(W_c)/d(frac_{axis_i}) as (C, N):
    dW_c/df_i = dw_i[dig_i] * prod_{j!=i} w_j[dig_j]."""
    ws = [_axis_weights(o, f, spec.CPA) for o, f in axes]
    ws[axis_i] = _axis_dweights(axes[axis_i][0], spec.CPA)
    return _outer_corners(ws, spec.CPA)


def _weights_row(spec, axes, f, dtype, t_frac=None, daxis: int = -1):
    """Corner weights as an (N, CF) lane-expanded row matching the table's
    corner-major feature layout, built DIRECTLY in lane-major form from the
    per-axis offsets/fractions.  Transposing the (C, N) reduce-path weights
    instead costs a materialized full-size relayout copy of the (N, CF)
    scatter update array (measured 864MB at the training workload).

    With ``t_frac`` (time-paired rows) the two time corners' lerp weights
    (1-t, t) join the outer product as the SLOWEST axis, producing the
    full (N, 2CF) paired weight row in one chain — building the two
    halves separately and lane-concatenating them costs a materialized
    (N, 2CF) fp32 copy (measured 171 ms/step across encode sites).

    Pure lane-decoded elementwise form: a (N, lanes) iota is decoded into
    per-axis corner digits and compared against each point's cell offset.
    No broadcast-into-new-axis + reshape chain — that materializes the
    (N, lanes) product in a reshape-unfriendly layout and XLA inserts a
    full relayout copy per (level, site) before the scatter (measured
    ~100 x 3ms of 'data formatting' copies per step).

    ``daxis >= 0`` builds the DERIVATIVE row d(W)/d(frac_daxis) instead
    (that axis contributes -1/+1 corner selections) — the reduce-path
    input for forward-saved position gradients under reduce_mode="dot"."""
    n = axes[0][0].shape[0]
    cpa = spec.CPA
    lanes = spec.corners_per_brick * f * (2 if t_frac is not None else 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, lanes), 1)
    cidx = j // f  # corner index; axis-0 digit fastest, time slowest
    w = None
    div = 1
    for ai, (o, fr) in enumerate(axes):
        dig = ((cidx // div) % cpa).astype(o.dtype)
        o_c = o[:, None]
        if ai == daxis:
            wi = jnp.where(
                dig == o_c, -1.0, jnp.where(dig == o_c + 1.0, 1.0, 0.0)
            ).astype(dtype)
        else:
            wi = jnp.where(
                dig == o_c, (1.0 - fr)[:, None],
                jnp.where(dig == o_c + 1.0, fr[:, None], 0.0),
            ).astype(dtype)
        w = wi if w is None else w * wi
        div *= cpa
    if t_frac is not None:
        tdig = (cidx // div).astype(t_frac.dtype)
        tf = t_frac[:, None]
        w = w * jnp.where(tdig == 0.0, 1.0 - tf, tf).astype(dtype)
    return w  # (N, lanes)


def _g_lanes(g_row, reps):
    """(N, F) cotangent -> (N, F*reps) lane-tiled [g, g, ...] via lane
    decode + select (fusable elementwise; ``jnp.tile``'s broadcast+reshape
    materializes a relayout copy at these shapes)."""
    n, f = g_row.shape
    if f == 1:
        return jnp.broadcast_to(g_row, (n, reps))
    j = jax.lax.broadcasted_iota(jnp.int32, (n, f * reps), 1) % f
    acc = None
    for k in range(f):
        term = jnp.where(j == k, g_row[:, k:k + 1], 0.0)
        acc = term if acc is None else acc + term
    return acc


def _reduce_row_lane(spec, axes, feats, prev=None):
    """F=1 fast path: (N, C) gathered rows x lane-major corner weights ->
    (N, 1).  One full-lane multiply + f32 lane reduction; the per-corner
    slice unroll degenerates to C narrow (N, 1) MACs for F=1 (measured
    ~150 ms/step across the two proposal grids on v5e).

    No barrier on the weight row: its only consumer is the reduce below,
    which already depends on the (barrier-serialized) gathered rows, so it
    fuses into that reduce without materializing.  (An earlier revision
    barriered ``prev`` -> wrow directly, which forced each level's (N, C)
    row to materialize — 61 ms/step across the proposal grids.)"""
    del prev
    wrow = _weights_row(spec, axes, 1, feats.dtype)
    # reduce in the feats dtype (bf16): converting the (N, C) product to
    # f32 before the sum materializes a 2x-size intermediate; the <=2-bit
    # accumulation loss over <=125 lanes is below the bf16 table noise
    return (feats * wrow).sum(axis=1)[:, None].astype(jnp.float32)


def _onehot_rows_grad(rset, upd, t_eff: int, chunk: int = 65536):
    """(N,) rows + (N, W) fp32 updates -> (t_eff, W) fp32 dense grad.

    grad[t] = sum_n 1[rows_n == t] * upd_n, evaluated as chunked one-hot
    contractions on the MXU with fp32 accumulation — measured 816M rows/s
    at T=512 / 167M at T=4096 vs the ~45-72M rows/s XLA scatter-add wall
    (perf/bench_scatter_alts.py).  The fp32 updates are split into
    hi + lo bf16 components (two MXU passes; the one-hot operand is exact
    in bf16), so the result matches the scatter to ~2^-16 relative — the
    grad-parity unit tests hold at their fp32 tolerances."""
    n, width = upd.shape
    chunk = min(chunk, n)
    pad = (-n) % chunk
    if pad:
        # padded rows point at t_eff, which matches no one-hot column
        rset = jnp.concatenate(
            [rset, jnp.full((pad,), t_eff, rset.dtype)]
        )
        upd = jnp.concatenate([upd, jnp.zeros((pad, width), upd.dtype)])
    nc = (n + pad) // chunk
    cols = jnp.arange(t_eff, dtype=jnp.int32)

    def body(c, buf):
        r = jax.lax.dynamic_slice(rset, (c * chunk,), (chunk,))
        u = jax.lax.dynamic_slice(upd, (c * chunk, 0), (chunk, width))
        oh = (r[:, None] == cols[None, :]).astype(jnp.bfloat16)
        hi = u.astype(jnp.bfloat16)
        lo = (u - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        for part in (hi, lo):
            buf = buf + jax.lax.dot_general(
                oh.T, part, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return buf

    return jax.lax.fori_loop(
        0, nc, body, jnp.zeros((t_eff, width), jnp.float32)
    )


def _reduce_row_dot(feats, wrow, f):
    """(N, CF) gathered rows x (N, CF) lane-decoded weights -> (N, F) via
    one MXU contraction with a CONSTANT (CF, F) per-feature selection
    matrix: out[n, f] = sum_c (feats*wrow)[n, cF+f].

    Gets einsum-level op count (the compile-time fix: the 27-slice unroll
    traces ~3.3x the equations, perf/hlo_size.py) without einsum's
    (N, C, F) relayout copy — the elementwise product fuses into the dot's
    lhs and the strided lane sum runs on the MXU.  fp32 accumulation."""
    n, w = feats.shape
    c = w // f
    prod = feats * wrow.astype(feats.dtype)
    if f == 1:
        return prod.sum(axis=1, keepdims=True).astype(jnp.float32)
    sel = jnp.tile(jnp.eye(f, dtype=feats.dtype), (c, 1))  # (CF, F) const
    out = jax.lax.dot_general(
        prod, sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out


def _reduce_row(feats, weights, f, mode="unroll"):
    """(N, CF) gathered rows x (C, N) corner weights -> (N, F).

    "unroll": per-corner lane-slice multiply-adds — NO (N, C, F) reshape,
    which XLA materializes as a second full-size relayout copy of the
    gather output (measured 648MB per level at the training workload).
    "einsum": single contraction, lets XLA pick the layout."""
    n, w = feats.shape
    c = w // f
    if mode == "einsum":
        w27 = weights.T.astype(feats.dtype)  # (N, C)
        return jnp.einsum("nc,ncf->nf", w27, feats.reshape(n, c, f))
    acc = None
    for ci in range(c):
        term = feats[:, ci * f : (ci + 1) * f] * weights[ci].astype(
            feats.dtype
        )[:, None]
        acc = term if acc is None else acc + term
    return acc  # (N, F)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def brickgrid_encode(
    table: jnp.ndarray,
    positions: jnp.ndarray,
    spec: BrickGridSpec,
    needs_pos_grad: bool = True,
) -> jnp.ndarray:
    """Encode positions ((..., D), in [0,1]) -> (..., L*F) features.

    One wide gather per (point, level) for 3D, two for 4D — the measured
    -optimal formulation on v5e (gathers are row-rate-bound).  All levels
    are fetched in a single take with static per-level offsets."""
    out, _ = _encode_impl(table, positions, spec)
    return out


def _encode_impl(table, positions, spec: BrickGridSpec, want_aux: bool = False):
    """Returns (features, aux). ``aux`` (only when ``want_aux``) is a tuple
    of per-level (N, G, F) arrays holding the forward-saved position
    -gradient reductions: per spatial axis i, sum_c dW_c/df_i * feats_c
    (time-lerped), plus (f1 - f0) for the time axis — each pre-scaled by
    the level scale, so the backward is just (aux * g).sum per axis."""
    d = spec.n_input_dims
    f = spec.n_features_per_level
    batch_shape = positions.shape[:-1]
    x = positions.reshape(-1, d).T  # (D, N), N-minor
    n = x.shape[1]
    xt = x[: spec.spatial_dims]
    tt = x[spec.spatial_dims] if spec.has_time else None
    scales, strides, uses_hash = _level_constants(spec)
    b = spec.bricks_per_level
    half = spec.corners_per_brick * f

    # per-(level, time-slice) gathers from STATIC per-level table slices.
    # Two measured reasons (perf/microbench.py + /tmp span test):
    #   * bounded transients: one take over all levels would materialize
    #     L*S*N rows — tens of GB at the training workload;
    #   * XLA picks its gather strategy by OPERAND size: takes from the
    #     full multi-level table run ~80M rows/s, takes from a <=33MB
    #     static slice run ~250M rows/s — a 3x cliff.
    outs = []
    auxs = [] if want_aux else None
    prev = None
    for lvl in range(spec.n_levels_used):
        rows, axes, t_frac = _level_geometry(
            spec, xt, tt, lvl, scales, strides, uses_hash
        )
        if prev is not None:
            # serialize levels: each (N, 27F) gather transient is ~hundreds
            # of MB at training N; without an explicit ordering edge XLA
            # schedules many levels' gathers concurrently and keeps all
            # their outputs live at once (measured 6.5GB -> OOM)
            rows = tuple(
                jax.lax.optimization_barrier((r, prev))[0] for r in rows
            )
        level_table = jax.lax.slice_in_dim(table, lvl * b, (lvl + 1) * b)
        use_dot = spec.reduce == "dot" and f > 1
        if use_dot:
            wrow = _weights_row(spec, axes, f, table.dtype)  # (N, CF)

            def reduce_fn(feats, _w=None, wr=None):
                return _reduce_row_dot(
                    feats, wrow if wr is None else wr, f
                ).astype(feats.dtype)

        else:
            weights = _corner_weights(spec, axes)

            def reduce_fn(feats, _w=None, wr=None):
                return _reduce_row(
                    feats, _w if _w is not None else weights, f, spec.reduce
                )

        tw = None
        if spec.uses_time_pair:
            # ONE (N, 2*27F)-row gather: both time corners in the row
            feats0 = jnp.take(level_table, rows[0], axis=0, mode="clip")
            lo, hi = feats0[:, :half], feats0[:, half:]
            f0 = reduce_fn(lo)
            f1 = reduce_fn(hi)
            tw = t_frac.astype(f0.dtype)[:, None]
            out_l = f0 * (1.0 - tw) + f1 * tw
        else:
            # time slices gathered SEPARATELY on purpose: merging them into
            # one 2N take raises the gather rate ~10% but doubles the live
            # (N, 27F) transient — measured OOM at the training workload
            lo = jnp.take(level_table, rows[0], axis=0, mode="clip")
            if f == 1 and not spec.has_time:
                f0 = _reduce_row_lane(spec, axes, lo, prev)  # (N, 1), f32
            else:
                f0 = reduce_fn(lo)  # (N, F)
            f1 = hi = None
            out_l = f0
            if spec.has_time:
                hi = jnp.take(level_table, rows[1], axis=0, mode="clip")
                f1 = reduce_fn(hi)
                tw = t_frac.astype(f0.dtype)[:, None]
                out_l = f0 * (1.0 - tw) + f1 * tw
        if want_aux:
            # lerped corner rows for the spatial derivative reductions;
            # fused into the dweight reduces below (no extra gather)
            if spec.has_time:
                feats_lerp = lo * (1.0 - tw) + hi * tw
            else:
                feats_lerp = lo
            sc = jnp.asarray(scales[lvl], out_l.dtype)
            parts = []
            for i in range(spec.spatial_dims):
                if use_dot:
                    dwr = _weights_row(spec, axes, f, table.dtype, daxis=i)
                    parts.append(reduce_fn(feats_lerp, wr=dwr) * sc)
                else:
                    dw = _corner_dweights(spec, axes, i)
                    parts.append(reduce_fn(feats_lerp, _w=dw) * sc)
            if spec.has_time:
                parts.append((f1 - f0) * sc)
            aux_l = jnp.stack(parts, axis=1)  # (N, G, F)
            # the aux reduction is the LAST consumer of this level's
            # gathered-row transient; tie it into the serialization chain,
            # otherwise XLA defers all levels' aux math to the end of the
            # forward and keeps every level's (N, row_width) copy live at
            # once (measured: 10 x 216MB concurrent copies -> OOM)
            out_l, aux_l = jax.lax.optimization_barrier((out_l, aux_l))
            auxs.append(aux_l)
        outs.append(out_l)
        prev = out_l
    out = jnp.concatenate(outs, axis=-1)  # (N, L*F)
    aux = tuple(auxs) if want_aux else None
    return out.reshape(*batch_shape, spec.n_output_dims), aux


def brickgrid_encode_ref(table, positions, spec: BrickGridSpec):
    """Plain-autodiff oracle (same math, XLA-derived backward); used by
    tests to validate the custom VJP."""
    out, _ = _encode_impl(table, positions, spec)
    return out


def _corner_digits(spec: BrickGridSpec, c: int):
    idx = []
    for _ in range(spec.spatial_dims):
        idx.append(c % spec.CPA)
        c //= spec.CPA
    return idx


def _brickgrid_fwd(table, positions, spec, needs_pos_grad):
    want_aux = needs_pos_grad and spec.posgrad == "fwd"
    out, aux = _encode_impl(table, positions, spec, want_aux=want_aux)
    return out, (table, positions, aux)


def _brickgrid_bwd(spec, needs_pos_grad, residuals, g):
    table, positions, aux = residuals
    d = spec.n_input_dims
    f = spec.n_features_per_level
    batch_shape = positions.shape[:-1]
    x = positions.reshape(-1, d).T
    n = x.shape[1]
    xt = x[: spec.spatial_dims]
    tt = x[spec.spatial_dims] if spec.has_time else None
    scales, strides, uses_hash = _level_constants(spec)
    b = spec.bricks_per_level
    width = spec.row_width
    cpb = spec.corners_per_brick

    # cotangent per level: (N, L, F)
    gl = g.reshape(-1, spec.n_levels_used, f).astype(jnp.float32)

    mode = spec.scatter
    d_level_tables = []  # per-level (B, 27F) fp32 grad buffers
    d_pos_parts = [jnp.zeros((n,), jnp.float32) for _ in range(d)]
    lanes = np.arange(width, dtype=np.int32)

    # stride phase for grad_subsample: derived from the batch's position
    # bits so it varies per training step without threading an RNG key
    # through the custom VJP (positions are freshly sampled every step)
    sub_phase = None
    if spec.grad_sub > 1:
        bits = jax.lax.bitcast_convert_type(x[0, 0], jnp.uint32)
        sub_phase = (
            (bits >> jnp.uint32(9)) % jnp.uint32(spec.grad_sub)
        ).astype(jnp.int32)

    prev = None
    for lvl in range(spec.n_levels_used):
        rows, axes, t_frac = _level_geometry(
            spec, xt, tt, lvl, scales, strides, uses_hash
        )
        if prev is not None:
            # serialize levels (same liveness reasoning as the forward)
            rows = tuple(
                jax.lax.optimization_barrier((r, prev))[0] for r in rows
            )
        level_table = jax.lax.slice_in_dim(table, lvl * b, (lvl + 1) * b)
        weights = _corner_weights(spec, axes)
        g_row = gl[:, lvl, :]  # (N, F)
        tws = (1.0 - t_frac, t_frac) if spec.has_time else (None,)

        # ---- table gradient.  Three measured formulations per level
        # (perf/bench_scatter_alts.py):
        #   * one-hot MXU contraction for DENSE levels with small slices
        #     (exact; up to 11x the scatter wall);
        #   * wide (N, 27F)-row scatter-add otherwise (~45-72M rows/s);
        #     hashed levels optionally scatter a 1/k strided subsample
        #     scaled by k (grad_subsample, quality-gated approximation);
        #   * "flat" narrow per-lane scatters (tests/tiny models).
        lvl_rows_eff = int(spec.level_rows[lvl])
        use_onehot = (
            spec.onehot > 0
            and not uses_hash[lvl]
            and lvl_rows_eff * width <= spec.onehot
        )
        k_sub = spec.grad_sub
        if use_onehot or not uses_hash[lvl] or k_sub <= 1 or n < 2 * k_sub:
            k_sub = 1

        s_rows, s_axes, s_tfrac, s_grow = rows, axes, t_frac, g_row
        if k_sub > 1:
            # subsample the 1D INPUTS (rows/offsets/fractions/cotangents),
            # not the built (N, 27F) update rows — the weight-row outer
            # product is then only computed for the kept points
            m = n // k_sub
            sel = sub_phase + jnp.arange(m, dtype=jnp.int32) * k_sub
            s_rows = tuple(jnp.take(r, sel) for r in rows)
            s_axes = [
                (jnp.take(o, sel), jnp.take(fr, sel)) for o, fr in axes
            ]
            s_tfrac = jnp.take(t_frac, sel) if t_frac is not None else None
            s_grow = jnp.take(g_row, sel, axis=0) * float(k_sub)

        s_tws = (1.0 - s_tfrac, s_tfrac) if spec.has_time else (None,)
        if spec.uses_time_pair:
            # ONE (N, 2*27F)-row update: both time corners' updates side
            # by side, matching the paired row layout; time lerp weights
            # are folded into the weight-row outer product (no lane concat)
            wrow_pair = _weights_row(spec, s_axes, f, jnp.float32, s_tfrac)
            upds = [wrow_pair * _g_lanes(s_grow, 2 * cpb)]
        else:
            # per-slice updates (merging doubles the live fp32 update
            # buffer — measured OOM); one wide row per slice
            g_tiled_s = _g_lanes(s_grow, cpb)  # (N, 27F)
            wrow = _weights_row(spec, s_axes, f, jnp.float32)  # (N, 27F)
            upds = []
            for tw in s_tws:
                upd = wrow * g_tiled_s  # (N, 27F)
                if tw is not None:
                    upd = upd * tw[:, None]
                upds.append(upd)
        if use_onehot:
            d_lvl = jnp.zeros((lvl_rows_eff, width), jnp.float32)
            for rset, upd in zip(s_rows, upds):
                d_lvl = d_lvl + _onehot_rows_grad(rset, upd, lvl_rows_eff)
            d_lvl = jnp.pad(d_lvl, ((0, b - lvl_rows_eff), (0, 0)))
        elif mode == "flat":
            d_lvl = jnp.zeros((b * width,), jnp.float32)
            for rset, upd in zip(s_rows, upds):
                idx = rset[:, None] * jnp.int32(width) + lanes[None, :]
                d_lvl = d_lvl.at[idx.reshape(-1)].add(upd.reshape(-1))
            d_lvl = d_lvl.reshape(b, width)
        else:  # wide
            d_lvl = jnp.zeros((b, width), jnp.float32)
            for rset, upd in zip(s_rows, upds):
                d_lvl = d_lvl.at[rset].add(upd)
        # cast per-level grads to the table dtype BEFORE the concatenate:
        # the final d_table is cast anyway, and concatenating fp32 buffers
        # first costs a materialized full-size fp32 copy (measured
        # 171 ms/step at the training workload for the fused 4D grid)
        d_level_tables.append(d_lvl.astype(table.dtype))
        prev = d_lvl[0]

        if needs_pos_grad and aux is not None:
            # fast path: forward-saved per-axis reductions (pre-scaled)
            aux_l = aux[lvl].astype(jnp.float32)  # (N, G, F)
            gd = (aux_l * g_row[:, None, :]).sum(axis=-1)  # (N, G)
            for i in range(d):
                d_pos_parts[i] = d_pos_parts[i] + gd[:, i]
        elif needs_pos_grad:
            # d out / d frac needs the gathered features back (frugal
            # residuals: re-gather instead of saving (N, 27F) per level)
            feats_all = [
                jnp.take(level_table, rset, axis=0, mode="clip").astype(
                    jnp.float32
                )
                for rset in rows
            ]
            # gdot[:, c] = sum_f g_f * feats[:, cF+f], per time slice
            g_tiled = _g_lanes(g_row, cpb)  # (N, 27F)
            gdots = []
            if spec.uses_time_pair:
                half = cpb * f
                feats_pair = feats_all[0]
                for part in (feats_pair[:, :half], feats_pair[:, half:]):
                    gdots.append(
                        (part * g_tiled).reshape(n, cpb, f).sum(axis=-1)
                    )
            else:
                for feats in feats_all:
                    gdots.append(
                        (feats * g_tiled).reshape(n, cpb, f).sum(axis=-1)
                    )  # (N, 27)
            if spec.has_time:
                gdot = gdots[0] * tws[0][:, None] + gdots[1] * tws[1][:, None]
            else:
                gdot = gdots[0]
            gdot_t = gdot.T  # (C, N)

            for i in range(spec.spatial_dims):
                dw_c = _corner_dweights(spec, axes, i)  # (C, N)
                acc = (gdot_t * dw_c).sum(axis=0)  # (N,)
                d_pos_parts[i] = d_pos_parts[i] + acc * scales[lvl]
            if spec.has_time:
                # d/dt: lerp derivative ((f1 - f0) . g) * scale
                gsum = (
                    (gdots[1] - gdots[0]) * weights.T
                ).sum(axis=-1)  # (N,)
                d_pos_parts[d - 1] = d_pos_parts[d - 1] + gsum * scales[lvl]

    d_table = jnp.concatenate(d_level_tables, axis=0)
    d_pos = jnp.stack(d_pos_parts).T.reshape(*batch_shape, d)
    if not needs_pos_grad:
        d_pos = jnp.zeros_like(positions)
    return d_table, d_pos.astype(positions.dtype)


brickgrid_encode.defvjp(_brickgrid_fwd, _brickgrid_bwd)
