"""Device-resident scene tensors + on-device ray-batch sampling.

TPU-first redesign of the reference data engine
(/root/reference/datasets/base/pixel_source.py, lidar_source.py): instead of
host-side torch tensors feeding `.cuda()` copies each step
(train_emernerf.py:638-640), the whole (preprocessed) scene lives in HBM as
one pytree and ray batches are *gathered inside the jitted train step* —
uniform sampling via randint, error-buffer importance sampling via Gumbel
top-k (the XLA equivalent of ``torch.multinomial(replacement=False)``,
pixel_source.py:588-592).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp

from emernerf_tpu.data.rays import get_rays


@flax.struct.dataclass
class SceneTensors:
    """Everything the sampler needs, resident on device.

    Pixel side: images are (N, H, W, 3) float32 in [0, 1]; error maps are
    (N, H//bd, W//bd).  Lidar side is pre-filtered to training timesteps.
    Optional members are None when the corresponding supervision is off.
    """

    images: Any  # (N, H, W, 3)
    c2w: Any  # (N, 4, 4)
    intrinsics: Any  # (N, 3, 3)
    normed_timestamps: Any  # (N,)
    cam_ids: Any  # (N,) int32
    train_indices: Any  # (K,) int32 image indices available for training
    sky_masks: Optional[Any] = None  # (N, H, W)
    dynamic_masks: Optional[Any] = None  # (N, H, W)
    features: Optional[Any] = None  # (N, Hf, Wf, C)
    pixel_error_map: Optional[Any] = None  # (N, H//bd, W//bd)
    lidar_origins: Optional[Any] = None  # (M, 3)
    lidar_viewdirs: Optional[Any] = None  # (M, 3)
    lidar_ranges: Optional[Any] = None  # (M,)
    lidar_normed_timestamps: Optional[Any] = None  # (M,)
    aabb: Optional[Any] = None  # (6,)

    @property
    def num_images(self):
        return self.images.shape[0]

    @property
    def image_hw(self):
        return self.images.shape[1], self.images.shape[2]


def sample_pixel_batch(
    scene: SceneTensors,
    key,
    num_rays: int,
    buffer_ratio: float = 0.0,
    buffer_downscale: int = 16,
    use_timestamps: bool = True,
):
    """Sample a training pixel-ray batch on device
    (pixel_source.py:666-731).  A ``buffer_ratio`` fraction of rays comes
    from the pixel-error importance buffer when present."""
    h, w = scene.image_hw
    k_img, k_x, k_y, k_imp, k_off = jax.random.split(key, 5)

    n_roi = int(num_rays * buffer_ratio) if scene.pixel_error_map is not None else 0
    if n_roi > 0:
        # top-k without replacement cannot exceed the buffer entry count
        n_entries = int(scene.train_indices.shape[0]) * int(
            scene.pixel_error_map.shape[1]
        ) * int(scene.pixel_error_map.shape[2])
        n_roi = min(n_roi, n_entries)
    n_uniform = num_rays - n_roi

    # --- uniform rays (pixel_source.py:616-664) ---
    rand_idx = jax.random.randint(
        k_img, (n_uniform,), 0, scene.train_indices.shape[0]
    )
    img_idx_u = scene.train_indices[rand_idx]
    x_u = jax.random.randint(k_x, (n_uniform,), 0, w)
    y_u = jax.random.randint(k_y, (n_uniform,), 0, h)

    if n_roi > 0:
        # --- importance rays via Gumbel top-k (pixel_source.py:564-614) ---
        err = scene.pixel_error_map[scene.train_indices]  # (K, hb, wb)
        kk, hb, wb = err.shape
        logits = jnp.log(jnp.maximum(err.reshape(-1), 1e-12))
        gumbel = -jnp.log(
            -jnp.log(jax.random.uniform(k_imp, logits.shape, minval=1e-12))
        )
        _, flat_idx = jax.lax.top_k(logits + gumbel, n_roi)
        img_i = flat_idx // (hb * wb)
        y_b = (flat_idx % (hb * wb)) // wb
        x_b = flat_idx % wb
        img_idx_r = scene.train_indices[img_i]
        off = jax.random.randint(k_off, (2, n_roi), 0, buffer_downscale)
        y_r = jnp.clip(y_b * buffer_downscale + off[0], 0, h - 1)
        x_r = jnp.clip(x_b * buffer_downscale + off[1], 0, w - 1)
        img_idx = jnp.concatenate([img_idx_u, img_idx_r])
        x = jnp.concatenate([x_u, x_r])
        y = jnp.concatenate([y_u, y_r])
    else:
        img_idx, x, y = img_idx_u, x_u, y_u

    origins, viewdirs, dnorm = get_rays(
        x, y, scene.c2w[img_idx], scene.intrinsics[img_idx]
    )
    batch = {
        "origins": origins,
        "viewdirs": viewdirs,
        "direction_norms": dnorm,
        "pixel_coords": jnp.stack([y / h, x / w], axis=-1),
        "pixels": scene.images[img_idx, y, x],
        "img_idx": img_idx,
        "cam_idx": scene.cam_ids[img_idx],
    }
    if use_timestamps:
        batch["normed_timestamps"] = scene.normed_timestamps[img_idx]
    if scene.sky_masks is not None:
        batch["sky_masks"] = scene.sky_masks[img_idx, y, x]
    # NOTE: dynamic masks are NOT gathered into training batches — no loss
    # consumes them on the hot path (the reference's masked dynamic-reg
    # variant exists but is never wired at its call sites,
    # train_emernerf.py:687-693; dynamic_regularization_loss here accepts
    # a mask for that dormant capability).  Eval reads masks off-device.
    if scene.features is not None:
        fh, fw = scene.features.shape[1:3]
        fy = (y * (fh / h)).astype(jnp.int32)
        fx = (x * (fw / w)).astype(jnp.int32)
        batch["features"] = scene.features[img_idx, fy, fx]
    return batch


def sample_lidar_batch(scene: SceneTensors, key, num_rays: int):
    """Uniform lidar-ray batch (lidar_source.py:223-308)."""
    idx = jax.random.randint(
        key, (num_rays,), 0, scene.lidar_origins.shape[0]
    )
    return {
        "origins": scene.lidar_origins[idx],
        "viewdirs": scene.lidar_viewdirs[idx],
        "ranges": scene.lidar_ranges[idx],
        "normed_timestamps": scene.lidar_normed_timestamps[idx],
    }


def update_pixel_error_map(scene: SceneTensors, pred_rgbs, gt_rgbs,
                           dynamic_opacities=None) -> SceneTensors:
    """Refresh the importance buffer from low-res renders
    (pixel_source.py:491-529): per-pixel |error| mean over channels,
    dynamic regions boosted 5x, then min-max normalized."""
    err = jnp.abs(gt_rgbs - pred_rgbs).mean(axis=-1)
    if dynamic_opacities is not None:
        err = jnp.where(dynamic_opacities > 0.1, err * 5.0, err)
    err = (err - err.min()) / jnp.maximum(err.max() - err.min(), 1e-8)
    return scene.replace(pixel_error_map=err)
