from emernerf_tpu.ops.activations import trunc_exp
from emernerf_tpu.ops.brickgrid import (
    BrickGridSpec,
    brickgrid_encode,
    init_brickgrid_table,
)
from emernerf_tpu.ops.contraction import contract_merf, normalize_aabb
from emernerf_tpu.ops.grid import grid_encode, init_grid_table
from emernerf_tpu.ops.hashgrid import HashGridSpec, hashgrid_encode, init_hashgrid_table
from emernerf_tpu.ops.sh import sh_encode, sh_output_dim
from emernerf_tpu.ops.sinusoidal import sinusoidal_encode, sinusoidal_output_dim

__all__ = [
    "trunc_exp",
    "contract_merf",
    "normalize_aabb",
    "BrickGridSpec",
    "brickgrid_encode",
    "init_brickgrid_table",
    "grid_encode",
    "init_grid_table",
    "HashGridSpec",
    "hashgrid_encode",
    "init_hashgrid_table",
    "sh_encode",
    "sh_output_dim",
    "sinusoidal_encode",
    "sinusoidal_output_dim",
]
