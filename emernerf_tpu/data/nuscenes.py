"""NuScenes scene loading.

Counterpart of /root/reference/datasets/nuscenes.py: builds a per-scene meta
dict by walking the nuscenes-devkit tables (sample -> sample_data tokens per
camera and lidar), handles the asynchronous cameras (each camera keeps its
own ego pose; the shared scene length is the minimum across cameras, scaled
by ``scene_fraction``, nuscenes.py:162-211), and loads lidar sweeps into
world-frame rays.  NuScenes provides no dynamic masks, no flow ground truth,
and the reference defines no test split for it (nuscenes.py:40,522-524).

Requires the ``nuscenes`` devkit package + dataset on disk; raises a clear
error otherwise (the devkit is not bundled in the TPU image).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

from emernerf_tpu.config import ConfigNode
from emernerf_tpu.data.dataset import SceneDataset

logger = logging.getLogger("emernerf_tpu")

CAMERA_LISTS = {
    1: ["CAM_FRONT"],
    3: ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT"],
    6: [
        "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT",
    ],
}

# OpenCV cam -> nuScenes ego uses quaternion extrinsics from the devkit; the
# devkit's calibrated_sensor already maps sensor->ego in the right-handed
# world convention, so only the standard OpenCV axis change is needed.
OPENCV2DATASET = np.array(
    [[0, 0, 1, 0], [-1, 0, 0, 0], [0, -1, 0, 0], [0, 0, 0, 1]], dtype=np.float64
)


def _quat_to_mat(q):
    w, x, y, z = q
    n = np.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _pose_to_mat(record) -> np.ndarray:
    m = np.eye(4)
    m[:3, :3] = _quat_to_mat(record["rotation"])
    m[:3, 3] = record["translation"]
    return m


def load_nuscenes_dataset(cfg: ConfigNode) -> SceneDataset:
    try:
        from nuscenes.nuscenes import NuScenes
    except ImportError as e:
        raise ImportError(
            "NuScenes support requires the `nuscenes-devkit` package and the "
            "nuScenes dataset on disk; install it in your data-prep "
            "environment (it is not bundled in the TPU training image)."
        ) from e
    from PIL import Image

    data_cfg = cfg.data
    pix = data_cfg.pixel_source
    nusc = NuScenes(
        version=getattr(data_cfg, "nuscenes_version", "v1.0-trainval"),
        dataroot=data_cfg.data_root,
        verbose=False,
    )
    scene = nusc.scene[data_cfg.scene_idx]
    cam_list = CAMERA_LISTS[pix.num_cams]
    hw = tuple(pix.load_size)

    # ---- walk sample_data chains per camera (asynchronous shutters) ----
    first_sample = nusc.get("sample", scene["first_sample_token"])
    per_cam_tokens = {c: [] for c in cam_list}
    for cam in cam_list:
        token = first_sample["data"][cam]
        while token:
            sd = nusc.get("sample_data", token)
            per_cam_tokens[cam].append(token)
            token = sd["next"]
    min_len = min(len(v) for v in per_cam_tokens.values())
    frac = float(getattr(data_cfg, "scene_fraction", 1.0))
    n_frames = int(min_len * frac)
    start = data_cfg.start_timestep
    end = n_frames if data_cfg.end_timestep == -1 else data_cfg.end_timestep

    images, c2ws, intrs, cam_ids, frame_idx = [], [], [], [], []
    world_ref: Optional[np.ndarray] = None
    for t in range(start, end):
        for ci, cam in enumerate(cam_list):
            sd = nusc.get("sample_data", per_cam_tokens[cam][t])
            calib = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
            ego = nusc.get("ego_pose", sd["ego_pose_token"])
            ego_to_world = _pose_to_mat(ego)
            if world_ref is None:
                world_ref = np.linalg.inv(ego_to_world)
            cam_to_ego = _pose_to_mat(calib)
            c2w = world_ref @ ego_to_world @ cam_to_ego
            img = Image.open(
                os.path.join(data_cfg.data_root, sd["filename"])
            ).convert("RGB")
            ow, oh = img.size
            img = img.resize((hw[1], hw[0]), Image.BILINEAR)
            k = np.array(calib["camera_intrinsic"], np.float64)
            k[0] *= hw[1] / ow
            k[1] *= hw[0] / oh
            images.append(np.asarray(img, np.float32) / 255.0)
            c2ws.append(c2w)
            intrs.append(k)
            cam_ids.append(ci)
            frame_idx.append(t - start)

    # ---- lidar sweeps ----
    lidar = None
    if data_cfg.lidar_source.load_lidar:
        lo, ld, lr, lt = [], [], [], []
        token = first_sample["data"]["LIDAR_TOP"]
        lidar_tokens = []
        while token:
            sd = nusc.get("sample_data", token)
            lidar_tokens.append(token)
            token = sd["next"]
        n_lidar = min(len(lidar_tokens), end - start)
        for t in range(n_lidar):
            sd = nusc.get("sample_data", lidar_tokens[t])
            calib = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
            ego = nusc.get("ego_pose", sd["ego_pose_token"])
            l2w = world_ref @ _pose_to_mat(ego) @ _pose_to_mat(calib)
            pts = np.fromfile(
                os.path.join(data_cfg.data_root, sd["filename"]),
                dtype=np.float32,
            ).reshape(-1, 5)[:, :3]
            mask = np.ones(len(pts), bool)
            lcfg = data_cfg.lidar_source
            if lcfg.truncated_max_range is not None:
                mask &= pts[:, 0] < lcfg.truncated_max_range
            if lcfg.truncated_min_range is not None:
                mask &= pts[:, 0] > lcfg.truncated_min_range
            pts = pts[mask]
            world_pts = pts @ l2w[:3, :3].T + l2w[:3, 3]
            origin = np.broadcast_to(l2w[:3, 3], world_pts.shape)
            dirs = world_pts - origin
            ranges = np.linalg.norm(dirs, axis=-1)
            lo.append(origin.astype(np.float32))
            ld.append((dirs / np.maximum(ranges[:, None], 1e-8)).astype(np.float32))
            lr.append(ranges.astype(np.float32))
            lt.append(np.full(len(pts), t, np.int64))
        lidar = dict(
            origins=np.concatenate(lo), viewdirs=np.concatenate(ld),
            ranges=np.concatenate(lr), frame_idx=np.concatenate(lt),
        )

    return SceneDataset(
        images=np.stack(images).astype(np.float32),
        c2w=np.stack(c2ws),
        intrinsics=np.stack(intrs),
        frame_idx=np.asarray(frame_idx),
        cam_ids=np.asarray(cam_ids, np.int32),
        sky_masks=None,  # provided separately if pre-extracted
        dynamic_masks=None,  # not available for nuScenes (nuscenes.py:40)
        lidar=lidar,
        test_image_stride=0,  # reference defines no nuScenes test split
        buffer_downscale=pix.sampler.buffer_downscale,
        buffer_ratio=pix.sampler.buffer_ratio,
    )
