"""NuScenes loader on a synthetic on-disk fixture (no devkit): cached
metas + image/sky-mask/lidar files through the full load path."""

import json
import os

import numpy as np
import pytest

from emernerf_tpu.config import from_dotlist, load_config
from emernerf_tpu.data.nuscenes import (
    _feature_path,
    _sky_mask_path,
    load_nuscenes_dataset,
)

DEFAULT_CONFIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configs", "default_config.yaml",
)

CAMS = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT"]


def _pose(t, dx=1.0):
    m = np.eye(4)
    m[0, 3] = t * dx
    return m


@pytest.fixture()
def nusc_fixture(tmp_path):
    from PIL import Image

    root = tmp_path / "nusc"
    n_img_frames = 4
    n_lidar_frames = 8  # lidar chain is longer (20 Hz vs 12 Hz keyframes)
    cam_meta = {}
    for cam in [
        "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT",
    ]:
        # CAM_FRONT gets one extra frame: the loader must clip to the
        # minimum shared length
        n = n_img_frames + (1 if cam == "CAM_FRONT" else 0)
        entries = {
            "timestamp": [], "filepath": [], "ego_pose": [],
            "cam_id": [], "extrinsics": [], "intrinsics": [],
        }
        for t in range(n):
            fp = f"samples/{cam}/{t:03d}.jpg"
            path = root / fp
            path.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(
                (np.random.rand(16, 24, 3) * 255).astype(np.uint8)
            ).save(path)
            # sky mask alongside
            smp = root / _sky_mask_path(fp)
            smp.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(
                (np.random.rand(16, 24) > 0.5).astype(np.uint8) * 255
            ).save(smp)
            entries["timestamp"].append(1000 + t)
            entries["filepath"].append(fp)
            entries["ego_pose"].append(_pose(t).tolist())
            entries["cam_id"].append(0)
            entries["extrinsics"].append(np.eye(4).tolist())
            entries["intrinsics"].append(
                [[20.0, 0, 12.0], [0, 20.0, 8.0], [0, 0, 1.0]]
            )
        cam_meta[cam] = entries

    lidar_meta = {"timestamp": [], "filepath": [], "extrinsics": [],
                  "ego_pose": []}
    for t in range(n_lidar_frames):
        fp = f"samples/LIDAR_TOP/{t:03d}.pcd.bin"
        path = root / fp
        path.parent.mkdir(parents=True, exist_ok=True)
        pts = np.random.rand(64, 5).astype(np.float32) * 10
        pts.tofile(path)
        lidar_meta["timestamp"].append(1000 + t)
        lidar_meta["filepath"].append(fp)
        lidar_meta["extrinsics"].append(np.eye(4).tolist())
        lidar_meta["ego_pose"].append(_pose(t / 2.0).tolist())

    meta_dir = root / "emernerf_metas"
    meta_dir.mkdir(parents=True)
    with open(meta_dir / "scene_000_camera.json", "w") as f:
        json.dump(cam_meta, f)
    with open(meta_dir / "scene_000_lidar.json", "w") as f:
        json.dump(lidar_meta, f)
    return str(root)


def _cfg(root, extra=()):
    cfg = load_config(DEFAULT_CONFIG)
    cfg.merge_(from_dotlist([
        "data.dataset=nuscenes",
        f"data.data_root={root}",
        "data.scene_idx=0",
        "data.pixel_source.num_cams=3",
        "data.pixel_source.load_size=[16,24]",
        "data.lidar_source.truncated_max_range=80",
        "data.lidar_source.truncated_min_range=-2",
        *extra,
    ]))
    return cfg


def test_nuscenes_loads_from_cached_meta(nusc_fixture):
    ds = load_nuscenes_dataset(_cfg(nusc_fixture))
    # minimum shared length = 4 frames x 3 cams
    assert ds.num_images == 12
    assert ds.num_frames == 4
    assert ds.num_cams == 3
    assert ds.images.shape == (12, 16, 24, 3)
    assert ds.sky_masks is not None and ds.sky_masks.shape == (12, 16, 24)
    # per-camera ego poses are honored: all c2w translations finite + the
    # world origin is CAM_FRONT's first ego pose (translation ~0 at t=0)
    front0 = ds.c2w[CAMS.index("CAM_FRONT")]
    np.testing.assert_allclose(front0[:3, 3], 0.0, atol=1e-6)
    # lidar fraction alignment: full camera range -> full lidar chain
    assert ds.lidar is not None
    assert ds.lidar["frame_idx"].max() == 3  # mapped onto image frames
    assert ds.scene_fraction == pytest.approx(1.0)
    # scene tensors materialize end-to-end
    scene = ds.scene_tensors()
    assert scene.images.shape == (12, 16, 24, 3)


def test_nuscenes_end_timestep_sets_fraction(nusc_fixture):
    ds = load_nuscenes_dataset(
        _cfg(nusc_fixture, ["data.end_timestep=1"])
    )
    # frames 0..1 inclusive -> 2 of 4 timesteps
    assert ds.num_frames == 2
    assert ds.scene_fraction == pytest.approx(0.5)
    # lidar clipped to the same fraction of its own 8-scan chain
    assert len(np.unique(ds.lidar["frame_idx"])) <= 4


def test_nuscenes_feature_paths():
    assert _sky_mask_path("samples/CAM_FRONT/a.jpg") == (
        "samples_sky_mask/CAM_FRONT/a.png"
    )
    assert _feature_path("sweeps/CAM_FRONT/a.jpg", "dinov2_vitb14") == (
        "sweeps_dinov2_vitb14/CAM_FRONT/a.npy"
    )
