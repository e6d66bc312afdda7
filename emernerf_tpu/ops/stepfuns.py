"""Step-function math for proposal sampling and interlevel losses.

TPU-native replacements for the CUDA pieces the reference pulls from nerfacc
(/root/reference/third_party/nerfacc_prop_net.py): inverse-CDF importance
sampling, the s<->t ray-warp transforms (with the reference's piecewise
linear/inverse split at 200m, nerfacc_prop_net.py:299-314), transmittance
from density, and the zip-NeRF anti-aliased interlevel loss
(blur_stepfun / sorted_interp_quad, nerfacc_prop_net.py:22-60).

Everything operates on dense, statically-shaped (n_rays, n_edges) arrays —
the TPU-friendly formulation (no ragged packing as in nerfacc's CUDA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------
# s <-> t transforms
# --------------------------------------------------------------------------

_STOT_FWD = {
    "uniform": lambda x: x,
    "lindisp": lambda x: 1.0 / x,
    "sqrt": jnp.sqrt,
    "log": jnp.log,
    # piecewise: linear below 200m, inverse-distance beyond
    "uniform_lindisp": lambda x: jnp.where(x < 200.0, x / 400.0, 1.0 - 1.0 / (2.0 * x / 200.0)),
    "uniform_lindisp_0": lambda x: jnp.where(x < 1.0, x / 2.0, 1.0 - 1.0 / (2.0 * x)),
}
_STOT_INV = {
    "uniform": lambda x: x,
    "lindisp": lambda x: 1.0 / x,
    "sqrt": lambda x: x**2,
    "log": jnp.exp,
    "uniform_lindisp": lambda x: jnp.where(x < 0.5, x * 400.0, 200.0 / (2.0 - 2.0 * x)),
    "uniform_lindisp_0": lambda x: jnp.where(x < 0.5, 2.0 * x, 1.0 / (2.0 - 2.0 * x)),
}


def transform_stot(transform_type: str, s_vals, t_min, t_max):
    """Map normalized s in [0,1] to metric t in [t_min, t_max]
    (nerfacc_prop_net.py:317-339)."""
    fwd = _STOT_FWD[transform_type]
    inv = _STOT_INV[transform_type]
    s_min, s_max = fwd(jnp.asarray(t_min, jnp.float32)), fwd(jnp.asarray(t_max, jnp.float32))
    return inv(s_vals * s_max + (1.0 - s_vals) * s_min)


# --------------------------------------------------------------------------
# transmittance / weights
# --------------------------------------------------------------------------

def exclusive_cumsum(x, axis=-1):
    """Cumulative sum shifted right with a leading zero."""
    c = jnp.cumsum(x, axis=axis)
    zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis))
    return jnp.concatenate(
        [zero, jax.lax.slice_in_dim(c, 0, c.shape[axis] - 1, axis=axis)], axis=axis
    )


def render_transmittance_from_density(t_starts, t_ends, sigmas):
    """Dense closed form of nerfacc's CUDA op (render_utils.py:73):
    alpha_i = 1 - exp(-sigma_i * dt_i); T_i = exp(-sum_{j<i} sigma_j dt_j)."""
    sdt = sigmas * (t_ends - t_starts)
    trans = jnp.exp(-exclusive_cumsum(sdt))
    alphas = 1.0 - jnp.exp(-sdt)
    return trans, alphas


def render_weights_from_density(t_starts, t_ends, sigmas):
    trans, alphas = render_transmittance_from_density(t_starts, t_ends, sigmas)
    return trans * alphas, trans, alphas


def accumulate_along_rays(weights, values=None):
    """Weighted sum over the samples axis; values (R,S,C) or None -> opacity.
    Dense replacement for nerfacc.accumulate_along_rays."""
    if values is None:
        return weights.sum(axis=-1, keepdims=True)
    return (weights[..., None] * values).sum(axis=-2)


# --------------------------------------------------------------------------
# inverse-CDF importance sampling
# --------------------------------------------------------------------------

def _searchsorted_batched(sorted_seq, values, side="right"):
    """Row-wise searchsorted: sorted_seq (R, K), values (R, M) -> (R, M).

    Compare-all formulation: one fused (R, M, K) compare+reduce.  At the
    sampler's shapes (K, M <= 129) this is a few ms of pure VPU work;
    ``jnp.searchsorted`` (scan method) lowers to a while-loop of gathers
    that measured 181 ms/step on v5e."""
    if side == "right":
        mask = sorted_seq[:, None, :] <= values[:, :, None]
    else:
        mask = sorted_seq[:, None, :] < values[:, :, None]
    return mask.sum(axis=-1).astype(jnp.int32)


def _take_rowwise(x, idx):
    """x (R, K), idx (R, M) -> x[r, idx[r, m]] via a one-hot contraction.

    ``jnp.take_along_axis`` at these shapes lowers to a serialized gather
    (measured 122 ms/step); the fused one-hot multiply-reduce is VPU-bound
    and fuses with its consumers."""
    k = jnp.arange(x.shape[-1], dtype=idx.dtype)
    onehot = (idx[:, :, None] == k[None, None, :]).astype(x.dtype)
    return (onehot * x[:, None, :]).sum(axis=-1)


def importance_sampling(s_vals, cdfs, n_intervals, stratified, key=None):
    """Draw `n_intervals` new intervals from a CDF defined on interval edges.

    Equivalent to nerfacc.pdf.importance_sampling on dense tensors
    (nerfacc_prop_net.py:153,172): samples n+1 CDF positions per ray
    (uniformly spaced; single per-ray jitter when stratified) and inverts the
    piecewise-linear CDF.

    Args:
        s_vals: (R, K+1) interval edges in s-space, sorted ascending.
        cdfs: (R, K+1) CDF values at those edges (monotone, cdfs[...,0]=0).
        n_intervals: number of output intervals n.
    Returns:
        (R, n+1) new interval edges in s-space.
    """
    r = s_vals.shape[0]
    n_edges = n_intervals + 1
    pad = 1.0 / (2 * n_edges)
    u_base = jnp.linspace(pad, 1.0 - pad, n_edges, dtype=s_vals.dtype)
    if stratified:
        jitter = jax.random.uniform(
            key, (r, 1), dtype=s_vals.dtype, minval=-pad, maxval=pad
        )
        u = u_base[None, :] + jitter
    else:
        u = jnp.broadcast_to(u_base[None, :], (r, n_edges))
    # normalize the cdf in case opacity saturates below 1
    cdfs = cdfs / jnp.maximum(cdfs[..., -1:], 1e-7)

    idx_right = _searchsorted_batched(cdfs, u, side="right")
    idx_lo = jnp.clip(idx_right - 1, 0, cdfs.shape[-1] - 1)
    idx_hi = jnp.clip(idx_right, 0, cdfs.shape[-1] - 1)

    cdf_lo = _take_rowwise(cdfs, idx_lo)
    cdf_hi = _take_rowwise(cdfs, idx_hi)
    s_lo = _take_rowwise(s_vals, idx_lo)
    s_hi = _take_rowwise(s_vals, idx_hi)

    t = jnp.clip(jnp.nan_to_num((u - cdf_lo) / (cdf_hi - cdf_lo), nan=0.0), 0.0, 1.0)
    return s_lo + t * (s_hi - s_lo)


# --------------------------------------------------------------------------
# zip-NeRF anti-aliased interlevel loss pieces
# --------------------------------------------------------------------------

def blur_stepfun(x, y, r):
    """Convolve a step function (edges x (R,K+1), values y (R,K)) with a box
    of half-width r. Returns new edges (R, 2K+2) and piecewise-linear values
    at those edges (R, 2K+2). Port of nerfacc_prop_net.py:22-34 semantics."""
    xr_cat = jnp.concatenate([x - r, x + r], axis=-1)
    zeros = jnp.zeros_like(y[..., :1])
    y1 = (
        jnp.concatenate([y, zeros], axis=-1) - jnp.concatenate([zeros, y], axis=-1)
    ) / (2.0 * r)
    # key-value sort instead of argsort + take_along_axis (serialized
    # gathers on TPU): sort both arrays by the edge positions in one op
    xr, y2_full = jax.lax.sort(
        (xr_cat, jnp.concatenate([y1, -y1], axis=-1)), dimension=-1, num_keys=1
    )
    y2 = y2_full[..., :-1]
    yr = jnp.clip(
        jnp.cumsum((xr[..., 1:] - xr[..., :-1]) * jnp.cumsum(y2, axis=-1), axis=-1),
        min=0.0,
    )
    return xr, jnp.concatenate([jnp.zeros_like(yr[..., :1]), yr], axis=-1)


def sorted_interp_quad(x, xp, fpdf, fcdf):
    """Quadratic interpolation of the integral of a piecewise-linear pdf.

    x: (R, M) query positions (sorted); xp/fpdf/fcdf: (R, K) knots.
    Port of nerfacc_prop_net.py:37-60, using searchsorted instead of the
    O(K*M) masked min/max (equivalent on sorted inputs).
    """
    k = xp.shape[-1]
    j = _searchsorted_batched(xp, x, side="right")
    idx0 = jnp.clip(j - 1, 0, k - 1)
    idx1 = jnp.clip(j, 0, k - 1)

    xp0 = _take_rowwise(xp, idx0)
    xp1 = _take_rowwise(xp, idx1)
    fcdf0 = _take_rowwise(fcdf, idx0)
    fpdf0 = _take_rowwise(fpdf, idx0)
    fpdf1 = _take_rowwise(fpdf, idx1)

    offset = jnp.clip(jnp.nan_to_num((x - xp0) / (xp1 - xp0), nan=0.0), 0.0, 1.0)
    return fcdf0 + (x - xp0) * (fpdf0 + fpdf1 * offset + fpdf0 * (1.0 - offset)) / 2.0


def pdf_outer_loss(s_query, cdfs_query, s_key, cdfs_key, eps=1e-7):
    """Mip-NeRF 360 interlevel loss (non-anti-aliased path,
    nerfacc_prop_net.py:342-362): penalize proposal mass that underestimates
    the outer envelope of the final distribution."""
    k = s_key.shape[-1]
    j_right = _searchsorted_batched(s_key, s_query, side="right")
    j_left = jnp.clip(j_right - 1, 0, k - 1)
    j_right = jnp.clip(j_right, 0, k - 1)

    w = cdfs_query[..., 1:] - cdfs_query[..., :-1]
    ids_left = j_left[..., :-1]
    ids_right = j_right[..., 1:]
    w_outer = _take_rowwise(cdfs_key, ids_right) - _take_rowwise(
        cdfs_key, ids_left
    )
    return jnp.clip(w - w_outer, min=0.0) ** 2 / (w + eps)
