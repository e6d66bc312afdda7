from emernerf_tpu.models.fields import DensityField, RadianceField
from emernerf_tpu.models.mlp import MLP

__all__ = ["DensityField", "RadianceField", "MLP"]
