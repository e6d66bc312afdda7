"""Grid-encoder dispatch: brick / mx (scatter-free) / exact hash grids.

``BrickGridSpec`` (ops/brickgrid.py) is the production TPU encoder — one
wide gather per (point, level).  ``HashGridSpec`` (ops/hashgrid.py) is the
exact Instant-NGP/tcnn layout kept for parity checks and small models.
Model code calls :func:`grid_encode` / :func:`init_grid_table` and works
with either spec type.
"""

from __future__ import annotations

import jax.numpy as jnp

from emernerf_tpu.ops.brickgrid import (
    BrickGridSpec,
    brickgrid_encode,
    init_brickgrid_table,
)
from emernerf_tpu.ops.hashgrid import (
    HashGridSpec,
    hashgrid_encode,
    init_hashgrid_table,
)
from emernerf_tpu.ops.mxgrid import (
    MXGridSpec,
    init_mxgrid_table,
    mxgrid_encode,
)


def grid_encode(table, positions, spec, needs_pos_grad: bool = True):
    if isinstance(spec, BrickGridSpec):
        return brickgrid_encode(table, positions, spec, needs_pos_grad)
    if isinstance(spec, MXGridSpec):
        return mxgrid_encode(table, positions, spec, needs_pos_grad)
    return hashgrid_encode(table, positions, spec, needs_pos_grad)


def init_grid_table(key, spec, dtype=jnp.float32, scale=1e-4):
    if isinstance(spec, BrickGridSpec):
        return init_brickgrid_table(key, spec, dtype=dtype, scale=scale)
    if isinstance(spec, MXGridSpec):
        return init_mxgrid_table(key, spec, dtype=dtype, scale=scale)
    return init_hashgrid_table(key, spec, dtype=dtype, scale=scale)
