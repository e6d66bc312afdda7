"""EmerNeRF-TPU: a TPU-native (JAX/XLA/Pallas) spatial-temporal neural radiance
field framework for driving scenes.

A ground-up rebuild of the capabilities of NVlabs/EmerNeRF (static + dynamic +
emergent scene-flow decomposition, proposal-network volume rendering, lidar /
sky / feature supervision) designed for TPU hardware: fused jitted train steps,
on-device ray sampling, hash-grid encodings as XLA/Pallas gathers, and
`jax.sharding`-based multi-chip scaling.
"""

__version__ = "0.1.0"
