"""Host-side scene dataset: split bookkeeping + device upload.

Counterpart of the reference SceneDataset / SplitWrapper
(/root/reference/datasets/base/scene_dataset.py, split_wrapper.py),
restructured for the TPU data path: the dataset holds numpy arrays, computes
train/test splits and the aabb, and materializes a :class:`SceneTensors`
pytree (the device-resident scene the fused train step samples from).
Whole-image eval rays are generated on demand.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from emernerf_tpu.data.scene import SceneTensors


class SceneDataset:
    """One driving scene: images + calibration + optional sky/dynamic masks,
    features and lidar, with reference-compatible split logic."""

    def __init__(
        self,
        images: np.ndarray,  # (N, H, W, 3) float32 [0,1]
        c2w: np.ndarray,  # (N, 4, 4)
        intrinsics: np.ndarray,  # (N, 3, 3)
        frame_idx: np.ndarray,  # (N,) int  image -> frame/timestep index
        cam_ids: np.ndarray,  # (N,) int
        sky_masks: Optional[np.ndarray] = None,
        dynamic_masks: Optional[np.ndarray] = None,
        features: Optional[np.ndarray] = None,
        lidar: Optional[Dict[str, np.ndarray]] = None,  # origins/viewdirs/ranges/frame_idx
        aabb: Optional[np.ndarray] = None,
        test_image_stride: int = 0,
        buffer_downscale: int = 16,
        buffer_ratio: float = 0.25,
    ):
        self.images = images
        self.c2w = c2w.astype(np.float32)
        self.intrinsics = intrinsics.astype(np.float32)
        self.frame_idx = np.asarray(frame_idx, np.int64)
        self.cam_ids = np.asarray(cam_ids, np.int32)
        self.sky_masks = sky_masks
        self.dynamic_masks = dynamic_masks
        self.features = features
        self.lidar = lidar
        self.buffer_downscale = buffer_downscale
        self.buffer_ratio = buffer_ratio
        self.test_image_stride = test_image_stride

        self.num_frames = int(self.frame_idx.max()) + 1
        self.num_cams = int(self.cam_ids.max()) + 1

        # joint [0,1] timestamp normalization over image + lidar frames
        # (waymo.py:494-508)
        all_frames = self.frame_idx.astype(np.float64)
        if lidar is not None:
            all_frames = np.concatenate(
                [all_frames, lidar["frame_idx"].astype(np.float64)]
            )
        fmin, fmax = all_frames.min(), all_frames.max()
        denom = max(fmax - fmin, 1.0)
        self.normed_timestamps = (
            (self.frame_idx - fmin) / denom
        ).astype(np.float32)
        if lidar is not None:
            self.lidar_normed_timestamps = (
                (lidar["frame_idx"] - fmin) / denom
            ).astype(np.float32)

        # ---- splits (waymo.py:511-548): every Nth timestep -> test ----
        frames = np.arange(self.num_frames)
        if test_image_stride > 0:
            test_frames = set(frames[::test_image_stride].tolist())
        else:
            test_frames = set()
        self.test_frames = np.asarray(sorted(test_frames), np.int64)
        is_test = np.isin(self.frame_idx, self.test_frames)
        self.train_indices = np.nonzero(~is_test)[0].astype(np.int32)
        self.test_indices = np.nonzero(is_test)[0].astype(np.int32)
        self.full_indices = np.arange(len(images), dtype=np.int32)

        # ---- aabb: lidar percentiles, else camera-derived (SURVEY §2 #17/18)
        if aabb is not None:
            self.aabb = np.asarray(aabb, np.float32)
        elif lidar is not None:
            pts = lidar["origins"] + lidar["viewdirs"] * lidar["ranges"][:, None]
            sub = pts[:: max(len(pts) // 100000, 1)]
            amin = np.quantile(sub, 0.02, axis=0)
            amax = np.quantile(sub, 0.98, axis=0)
            amax[2] = max(amax[2], 20.0)
            self.aabb = np.concatenate([amin, amax]).astype(np.float32)
        else:
            centers = self.c2w[:, :3, 3]
            amin = centers.min(0) - np.array([40.0, 40.0, 5.0])
            amax = centers.max(0) + np.array([40.0, 40.0, 20.0])
            self.aabb = np.concatenate([amin, amax]).astype(np.float32)

    # ---------------------------------------------------------------- #
    @property
    def image_hw(self):
        return self.images.shape[1], self.images.shape[2]

    @property
    def num_images(self):
        return len(self.images)

    @property
    def has_test_split(self) -> bool:
        return len(self.test_indices) > 0

    @property
    def num_train_timesteps(self) -> int:
        return len(set(self.frame_idx.tolist()) - set(self.test_frames.tolist()))

    @property
    def num_img_timesteps(self) -> int:
        return self.num_frames

    @property
    def unique_normalized_training_timestamps(self) -> np.ndarray:
        return np.unique(self.normed_timestamps[self.train_indices])

    @property
    def time_diff(self) -> float:
        return 1.0 / max(self.num_img_timesteps, 1)

    # ---------------------------------------------------------------- #
    def scene_tensors(self) -> SceneTensors:
        """Upload the training scene to device memory."""
        h, w = self.image_hw
        lidar_kw = {}
        if self.lidar is not None:
            # restrict lidar rays to training frames (lidar_source.py:244-279)
            mask = ~np.isin(self.lidar["frame_idx"], self.test_frames)
            lidar_kw = dict(
                lidar_origins=jnp.asarray(self.lidar["origins"][mask]),
                lidar_viewdirs=jnp.asarray(self.lidar["viewdirs"][mask]),
                lidar_ranges=jnp.asarray(self.lidar["ranges"][mask]),
                lidar_normed_timestamps=jnp.asarray(
                    self.lidar_normed_timestamps[mask]
                ),
            )
        error_map = None
        if self.buffer_ratio > 0:
            error_map = jnp.ones(
                (
                    self.num_images,
                    h // self.buffer_downscale,
                    w // self.buffer_downscale,
                ),
                jnp.float32,
            )
        return SceneTensors(
            images=jnp.asarray(self.images),
            c2w=jnp.asarray(self.c2w),
            intrinsics=jnp.asarray(self.intrinsics),
            normed_timestamps=jnp.asarray(self.normed_timestamps),
            cam_ids=jnp.asarray(self.cam_ids),
            train_indices=jnp.asarray(self.train_indices),
            sky_masks=jnp.asarray(self.sky_masks)
            if self.sky_masks is not None
            else None,
            dynamic_masks=jnp.asarray(self.dynamic_masks)
            if self.dynamic_masks is not None
            else None,
            features=jnp.asarray(self.features)
            if self.features is not None
            else None,
            pixel_error_map=error_map,
            aabb=jnp.asarray(self.aabb),
            **lidar_kw,
        )

    # ---------------------------------------------------------------- #
    def get_image_rays(self, img_idx: int, downscale: int = 1):
        """Whole-image eval rays (pixel_source.py:733-846): returns a rays
        dict of shape (H*W, ...) plus ground-truth maps."""
        h, w = self.image_hw
        hh, ww = h // downscale, w // downscale
        ys, xs = np.meshgrid(
            np.arange(hh) * downscale, np.arange(ww) * downscale, indexing="ij"
        )
        x = xs.reshape(-1).astype(np.float32)
        y = ys.reshape(-1).astype(np.float32)
        intr = self.intrinsics[img_idx].copy()

        cam_dirs = np.stack(
            [
                (x - intr[0, 2] + 0.5) / intr[0, 0],
                (y - intr[1, 2] + 0.5) / intr[1, 1],
                np.ones_like(x),
            ],
            axis=-1,
        )
        c2w = self.c2w[img_idx]
        dirs = cam_dirs @ c2w[:3, :3].T
        dnorm = np.linalg.norm(dirs, axis=-1, keepdims=True)
        viewdirs = dirs / (dnorm + 1e-8)
        origins = np.broadcast_to(c2w[:3, 3], viewdirs.shape)

        n = len(x)
        rays = {
            "origins": origins.astype(np.float32),
            "viewdirs": viewdirs.astype(np.float32),
            "direction_norms": dnorm.astype(np.float32),
            "pixel_coords": np.stack([y / h, x / w], -1).astype(np.float32),
            "normed_timestamps": np.full(
                n, self.normed_timestamps[img_idx], np.float32
            ),
            "img_idx": np.full(n, img_idx, np.int32),
            "cam_idx": np.full(n, self.cam_ids[img_idx], np.int32),
        }
        gt = {
            "pixels": self.images[img_idx, ::downscale, ::downscale],
            "hw": (hh, ww),
        }
        if self.sky_masks is not None:
            gt["sky_masks"] = self.sky_masks[img_idx, ::downscale, ::downscale]
        if self.dynamic_masks is not None:
            gt["dynamic_masks"] = self.dynamic_masks[
                img_idx, ::downscale, ::downscale
            ]
        if self.features is not None:
            fh, fw = self.features.shape[1:3]
            fy = (np.arange(hh) * downscale * fh / h).astype(np.int64)
            fx = (np.arange(ww) * downscale * fw / w).astype(np.int64)
            gt["features"] = self.features[img_idx][np.ix_(fy, fx)]
        return rays, gt

    def get_valid_lidar_mask(self, frame: int, points: np.ndarray) -> np.ndarray:
        """Lidar->camera visibility: True where a world-space point projects
        inside at least one of the frame's images with positive depth
        (reference datasets/waymo.py:638-668)."""
        h, w = self.image_hw
        img_indices = np.nonzero(self.frame_idx == frame)[0]
        valid = np.zeros(len(points), bool)
        for img_idx in img_indices:
            w2c = np.linalg.inv(
                self.c2w[img_idx].astype(np.float64)
            )
            cam_pts = points @ w2c[:3, :3].T + w2c[:3, 3]
            proj = cam_pts @ self.intrinsics[img_idx].astype(np.float64).T
            depth = proj[:, 2]
            uv = proj[:, :2] / (depth[:, None] + 1e-6)
            valid |= (
                (uv[:, 0] >= 0) & (uv[:, 0] < w)
                & (uv[:, 1] >= 0) & (uv[:, 1] < h)
                & (depth > 0)
            )
        return valid

    def get_lidar_render_rays(self, frame: int):
        """All lidar rays of one frame, for depth/flow eval."""
        if self.lidar is None:
            return None
        mask = self.lidar["frame_idx"] == frame
        return {
            "origins": self.lidar["origins"][mask],
            "viewdirs": self.lidar["viewdirs"][mask],
            "ranges": self.lidar["ranges"][mask],
            "normed_timestamps": self.lidar_normed_timestamps[mask],
        }
