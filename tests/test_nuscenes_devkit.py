"""NuScenes token walk against a devkit-LAYOUT fixture.

tests/test_nuscenes.py exercises loading from *cached metas*; these tests go
one layer deeper: they write raw nuScenes table JSONs
(``{dataroot}/{version}/{table}.json`` with the real public schema field
names) and drive ``create_or_load_metas`` through the built-in table reader
(emernerf_tpu/data/nuscenes_devkit_lite.py), so a wrong field name in the
token walk (reference contract: /root/reference/datasets/nuscenes.py:53-160,
300-356) fails here instead of only failing against the real devkit.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from emernerf_tpu.config import from_dotlist, load_config
from emernerf_tpu.data.nuscenes import (
    ALL_CAMERAS,
    create_or_load_metas,
    load_nuscenes_from_meta,
)

DEFAULT_CONFIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configs", "default_config.yaml",
)

N_KEYFRAMES = 3
N_LIDAR = 6  # lidar chain is longer, as in the real dataset


def _quat_about_z(theta):
    return [float(np.cos(theta / 2)), 0.0, 0.0, float(np.sin(theta / 2))]


def build_devkit_layout(root):
    """Write a miniature dataroot in the real nuScenes v1.0 table layout."""
    version_dir = root / "v1.0-mini"
    version_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)

    sensors, calibs, ego_poses, sample_datas, samples = [], [], [], [], []
    # one sensor + calibrated_sensor per channel
    channels = ALL_CAMERAS + ["LIDAR_TOP"]
    for ch in channels:
        sensors.append(
            {
                "token": f"sensor-{ch}",
                "channel": ch,
                "modality": "lidar" if ch == "LIDAR_TOP" else "camera",
            }
        )
        calibs.append(
            {
                "token": f"calib-{ch}",
                "sensor_token": f"sensor-{ch}",
                "translation": [1.5 if ch != "LIDAR_TOP" else 0.0, 0.0, 1.6],
                "rotation": _quat_about_z(0.1),
                "camera_intrinsic": (
                    [] if ch == "LIDAR_TOP"
                    else [[800.0, 0, 320.0], [0, 800.0, 240.0], [0, 0, 1.0]]
                ),
            }
        )

    # sample (keyframe) chain
    for i in range(N_KEYFRAMES):
        samples.append(
            {
                "token": f"sample-{i}",
                "timestamp": 1_000_000 * i,
                "prev": f"sample-{i-1}" if i > 0 else "",
                "next": f"sample-{i+1}" if i < N_KEYFRAMES - 1 else "",
                "scene_token": "scene-0",
            }
        )

    # per-camera sample_data chains (all key frames) + images on disk
    for ch in ALL_CAMERAS:
        for i in range(N_KEYFRAMES):
            ts = 1_000_000 * i + hash(ch) % 5000  # async shutters
            ego_poses.append(
                {
                    "token": f"ego-{ch}-{i}",
                    "timestamp": ts,
                    "translation": [2.0 * i, 0.1 * i, 0.0],
                    "rotation": _quat_about_z(0.02 * i),
                }
            )
            fname = f"samples/{ch}/{ch}__{i:06d}.jpg"
            p = root / fname
            p.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(
                rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
            ).save(p)
            sample_datas.append(
                {
                    "token": f"sd-{ch}-{i}",
                    "sample_token": f"sample-{i}",
                    "ego_pose_token": f"ego-{ch}-{i}",
                    "calibrated_sensor_token": f"calib-{ch}",
                    "timestamp": ts,
                    "fileformat": "jpg",
                    "is_key_frame": True,
                    "height": 48,
                    "width": 64,
                    "filename": fname,
                    "prev": f"sd-{ch}-{i-1}" if i > 0 else "",
                    "next": f"sd-{ch}-{i+1}" if i < N_KEYFRAMES - 1 else "",
                }
            )

    # lidar chain: keyframes at sample times + intermediate sweeps
    for i in range(N_LIDAR):
        ts = 500_000 * i
        key = i % 2 == 0
        ego_poses.append(
            {
                "token": f"ego-LIDAR_TOP-{i}",
                "timestamp": ts,
                "translation": [1.0 * i, 0.05 * i, 0.0],
                "rotation": _quat_about_z(0.01 * i),
            }
        )
        fname = (
            f"{'samples' if key else 'sweeps'}/LIDAR_TOP/"
            f"LIDAR_TOP__{i:06d}.pcd.bin"
        )
        p = root / fname
        p.parent.mkdir(parents=True, exist_ok=True)
        pts = rng.uniform(-1, 1, (128, 5)).astype(np.float32)
        pts[:, 0] = rng.uniform(2, 40, 128)  # x forward
        pts.tofile(p)
        sample_datas.append(
            {
                "token": f"sd-LIDAR_TOP-{i}",
                "sample_token": f"sample-{min(i // 2, N_KEYFRAMES - 1)}",
                "ego_pose_token": f"ego-LIDAR_TOP-{i}",
                "calibrated_sensor_token": "calib-LIDAR_TOP",
                "timestamp": ts,
                "fileformat": "pcd",
                "is_key_frame": key,
                "height": 0,
                "width": 0,
                "filename": fname,
                "prev": f"sd-LIDAR_TOP-{i-1}" if i > 0 else "",
                "next": f"sd-LIDAR_TOP-{i+1}" if i < N_LIDAR - 1 else "",
            }
        )

    scene = [
        {
            "token": "scene-0",
            "log_token": "log-0",
            "nbr_samples": N_KEYFRAMES,
            "first_sample_token": "sample-0",
            "last_sample_token": f"sample-{N_KEYFRAMES-1}",
            "name": "scene-0001",
            "description": "fixture",
        }
    ]
    tables = {
        "scene": scene,
        "sample": samples,
        "sample_data": sample_datas,
        "calibrated_sensor": calibs,
        "ego_pose": ego_poses,
        "sensor": sensors,
    }
    for name, records in tables.items():
        with open(version_dir / f"{name}.json", "w") as f:
            json.dump(records, f)


@pytest.fixture()
def devkit_root(tmp_path):
    root = tmp_path / "nusc"
    build_devkit_layout(root)
    return root


def _cfg(root):
    cfg = load_config(DEFAULT_CONFIG)
    cfg.merge_(
        from_dotlist(
            [
                "data.dataset=nuscenes",
                f"data.data_root={root}",
                "data.nuscenes_version=v1.0-mini",
                "data.scene_idx=0",
                "data.pixel_source.num_cams=3",
                "data.pixel_source.load_size=[24,32]",
                "data.pixel_source.load_sky_mask=false",
                "data.lidar_source.truncated_max_range=80",
                "data.lidar_source.truncated_min_range=-2",
            ]
        )
    )
    return cfg


def test_token_walk_builds_and_caches_metas(devkit_root):
    cfg = _cfg(devkit_root)
    cam_meta, lidar_meta = create_or_load_metas(cfg)

    # every camera chain walked to its end, with per-image ego poses
    for cam in ALL_CAMERAS:
        assert len(cam_meta[cam]["timestamp"]) == N_KEYFRAMES
        assert len(cam_meta[cam]["ego_pose"]) == N_KEYFRAMES
        assert cam_meta[cam]["filepath"][0].startswith(f"samples/{cam}/")
        k = np.asarray(cam_meta[cam]["intrinsics"][0])
        assert k.shape == (3, 3) and k[0, 0] == 800.0
        # extrinsic carries the calibrated_sensor translation
        e = np.asarray(cam_meta[cam]["extrinsics"][0])
        np.testing.assert_allclose(e[:3, 3], [1.5, 0.0, 1.6])
    # lidar chain includes sweeps (full sample_data chain, not keyframes)
    assert len(lidar_meta["timestamp"]) == N_LIDAR
    assert lidar_meta["filepath"][1].startswith("sweeps/LIDAR_TOP/")

    # metas were cached; a second call must not need the tables
    cache = devkit_root / "emernerf_metas" / "scene_000_camera.json"
    assert cache.exists()
    for t in ("scene", "sample", "sample_data"):
        os.rename(
            devkit_root / "v1.0-mini" / f"{t}.json",
            devkit_root / "v1.0-mini" / f"{t}.json.bak",
        )
    cam_meta2, _ = create_or_load_metas(cfg)
    assert cam_meta2["CAM_FRONT"]["timestamp"] == cam_meta["CAM_FRONT"]["timestamp"]


def test_dataset_loads_from_devkit_layout(devkit_root):
    cfg = _cfg(devkit_root)
    cam_meta, lidar_meta = create_or_load_metas(cfg)
    ds = load_nuscenes_from_meta(cam_meta, lidar_meta, cfg)
    # 3 cams x (N_KEYFRAMES - 1 + 1) frames (end=-1 keeps the last)
    assert ds.images.shape == (3 * N_KEYFRAMES, 24, 32, 3)
    assert ds.num_cams == 3
    assert ds.lidar is not None and len(ds.lidar["ranges"]) > 0
    assert np.isfinite(ds.c2w).all()
    # world origin normalized to CAM_FRONT's first ego pose
    front0 = ds.c2w[1]  # cam order: FL, F, FR -> index 1 is CAM_FRONT
    np.testing.assert_allclose(front0[:3, 3], [1.5, 0.0, 1.6], atol=1e-6)
