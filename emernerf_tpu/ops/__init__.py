from emernerf_tpu.ops.activations import trunc_exp
from emernerf_tpu.ops.contraction import contract_merf, normalize_aabb
from emernerf_tpu.ops.hashgrid import HashGridSpec, hashgrid_encode, init_hashgrid_table
from emernerf_tpu.ops.sinusoidal import sinusoidal_encode, sinusoidal_output_dim

__all__ = [
    "trunc_exp",
    "contract_merf",
    "normalize_aabb",
    "HashGridSpec",
    "hashgrid_encode",
    "init_hashgrid_table",
    "sinusoidal_encode",
    "sinusoidal_output_dim",
]
