"""Multi-chip scaling: ray-batch data parallelism over an ICI mesh.

The reference has no multi-device path at all (SURVEY.md §2.4 — dormant NCCL
helpers, never invoked).  The TPU-native design: a 1-D ``jax.sharding.Mesh``
over the "data" axis; the per-iteration ray batches (8192 pixel + 8192 lidar
rays) are sharded across chips, parameters and optimizer state are
replicated, and XLA's SPMD partitioner inserts the gradient ``psum`` over
ICI automatically when the mean losses contract the sharded batch axis.
This replaces a hand-written NCCL allreduce with compiler-placed
collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis_name,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_train_step(train_step, mesh: Mesh, axis_name: str = "data"):
    """Wrap a built train step with explicit shardings: state replicated,
    ray batches sharded on their leading axis.  Gradients are averaged
    across chips by XLA (the mean over the sharded batch axis lowers to a
    psum over ICI)."""
    rep = replicated_sharding(mesh)
    shard = batch_sharding(mesh, axis_name)

    def wrapped(state, pixel_batch, lidar_batch, key, *, pixel_rg, lidar_rg,
                lidar_full=False):
        state = jax.device_put(state, rep)
        pixel_batch = jax.device_put(pixel_batch, shard)
        if lidar_batch is not None:
            lidar_batch = jax.device_put(lidar_batch, shard)
        key = jax.device_put(key, rep)
        return train_step(
            state, pixel_batch, lidar_batch, key,
            pixel_rg=pixel_rg, lidar_rg=lidar_rg, lidar_full=lidar_full,
        )

    return wrapped


def shard_render_chunk(render_chunk, mesh: Mesh, axis_name: str = "data"):
    """Wrap a jitted eval render-chunk fn (eval/renderer.py:ImageRenderer)
    with explicit shardings: params replicated, the fixed-size ray chunk
    sharded on its leading axis.  Rendering is embarrassingly parallel
    across rays — no collective is needed; each chip renders its slice of
    the chunk and outputs stay sharded until the host gathers them."""
    rep = replicated_sharding(mesh)
    shard = batch_sharding(mesh, axis_name)

    def wrapped(params, prop_params, rays, key):
        params = jax.device_put(params, rep)
        prop_params = jax.device_put(prop_params, rep)
        rays = jax.device_put(rays, shard)
        key = jax.device_put(key, rep)
        return render_chunk(params, prop_params, rays, key)

    return wrapped
