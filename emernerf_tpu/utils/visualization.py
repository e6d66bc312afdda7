"""Visualization helpers: depth colormaps, scene-flow color wheel, feature
PCA colors.

Counterparts of /root/reference/utils/visualization_tools.py (depth
colormap with weighted percentile normalization :79-156, flow color wheel
:159-275) and utils/misc.py robust PCA (:23-47).
"""

from __future__ import annotations

import numpy as np
from matplotlib import colormaps


def weighted_percentile(x, w, ps, assume_sorted=False):
    """Weighted percentiles (visualization_tools.py:100-110)."""
    x = x.reshape(-1)
    w = w.reshape(-1)
    if not assume_sorted:
        sortidx = np.argsort(x)
        x, w = x[sortidx], w[sortidx]
    acc_w = np.cumsum(w)
    return np.interp(np.array(ps) * (acc_w[-1] / 100.0), acc_w, x)


def depth_visualizer(depth: np.ndarray, opacity: np.ndarray = None,
                     lo=None, hi=None, curve_fn=lambda x: -np.log(x + 1e-6),
                     cmap: str = "turbo") -> np.ndarray:
    """Depth map -> turbo-colored rgb in [0,1] with percentile
    normalization weighted by accumulation (visualization_tools.py:79-156)."""
    depth = np.asarray(depth, np.float64).squeeze()
    if opacity is None:
        opacity = np.ones_like(depth)
    opacity = np.asarray(opacity, np.float64).squeeze()
    if lo is None or hi is None:
        lo_auto, hi_auto = weighted_percentile(depth, opacity, [0.5, 99.5])
        lo = lo if lo is not None else lo_auto
        hi = hi if hi is not None else hi_auto
    depth_c = curve_fn(np.clip(depth, 1e-6, None))
    lo_c, hi_c = curve_fn(max(lo, 1e-6)), curve_fn(max(hi, 1e-6))
    value = np.clip(
        (depth_c - np.minimum(lo_c, hi_c)) / (np.abs(hi_c - lo_c) + 1e-10),
        0, 1,
    )
    if lo_c > hi_c:
        value = 1.0 - value
    colored = colormaps[cmap](1.0 - value)[..., :3]
    return (colored * opacity[..., None] + (1.0 - opacity[..., None])).astype(
        np.float32
    )


def _make_color_wheel():
    """Middlebury optical-flow color wheel (visualization_tools.py:205-247)."""
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    ncols = ry + yg + gc + cb + bm + mr
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[:ry, 0] = 255
    wheel[:ry, 1] = np.floor(255 * np.arange(ry) / ry)
    col += ry
    wheel[col : col + yg, 0] = 255 - np.floor(255 * np.arange(yg) / yg)
    wheel[col : col + yg, 1] = 255
    col += yg
    wheel[col : col + gc, 1] = 255
    wheel[col : col + gc, 2] = np.floor(255 * np.arange(gc) / gc)
    col += gc
    wheel[col : col + cb, 1] = 255 - np.floor(255 * np.arange(cb) / cb)
    wheel[col : col + cb, 2] = 255
    col += cb
    wheel[col : col + bm, 2] = 255
    wheel[col : col + bm, 0] = np.floor(255 * np.arange(bm) / bm)
    col += bm
    wheel[col : col + mr, 2] = 255 - np.floor(255 * np.arange(mr) / mr)
    wheel[col : col + mr, 0] = 255
    return wheel


_COLOR_WHEEL = _make_color_wheel()


def scene_flow_to_rgb(flow: np.ndarray, flow_max_radius=None,
                      background: str = "dark") -> np.ndarray:
    """Project xy flow components onto the Middlebury color wheel
    (visualization_tools.py:159-275). flow: (..., >=2)."""
    fx, fy = flow[..., 0], flow[..., 1]
    radius = np.sqrt(fx**2 + fy**2)
    angle = np.arctan2(fy, fx)
    if flow_max_radius is None:
        flow_max_radius = max(np.max(radius), 1e-6)
    radius = np.clip(radius / flow_max_radius, 0, 1)

    ncols = len(_COLOR_WHEEL)
    a = (angle + np.pi) / (2 * np.pi)  # [0,1]
    fk = a * (ncols - 1)
    k0 = np.floor(fk).astype(np.int64) % ncols
    k1 = (k0 + 1) % ncols
    f = (fk - np.floor(fk))[..., None]
    color = (1 - f) * _COLOR_WHEEL[k0] / 255.0 + f * _COLOR_WHEEL[k1] / 255.0
    if background == "dark":
        color = radius[..., None] * color
    else:
        color = 1 - radius[..., None] * (1 - color)
    return color.astype(np.float32)


def get_robust_pca(features: np.ndarray, m: float = 3.0):
    """3-component PCA with median-absolute-deviation outlier rejection for
    feature coloring (utils/misc.py:23-47). features: (N, C).
    Returns (reduction_mat (C,3), color_min (3,), color_max (3,))."""
    features = np.asarray(features, np.float64)
    centered = features - features.mean(0)
    # top-3 right singular vectors
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    reduction_mat = vt[:3].T
    colors = features @ reduction_mat

    d = np.abs(colors - np.median(colors, axis=0))
    mdev = np.median(d, axis=0) + 1e-12
    inliers = (d / mdev < m).all(axis=-1)
    cin = colors[inliers] if inliers.sum() > 0 else colors
    return (
        reduction_mat.astype(np.float32),
        cin.min(0).astype(np.float32),
        cin.max(0).astype(np.float32),
    )


def apply_pca_colors(features: np.ndarray, reduction_mat, cmin, cmax):
    colors = features @ reduction_mat
    return np.clip((colors - cmin) / (cmax - cmin + 1e-12), 0, 1)


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)
