"""Waymo loader test against a synthetic on-disk scene in the reference's
preprocessed format."""

import os

import numpy as np
import pytest
from PIL import Image

from emernerf_tpu.config import load_config
from emernerf_tpu.data.waymo import OPENCV2DATASET, load_waymo_dataset

DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configs", "default_config.yaml",
)


@pytest.fixture
def fake_scene(tmp_path):
    """Write a 4-frame single-camera scene in the preprocessed layout."""
    scene = tmp_path / "000"
    for sub in ("images", "intrinsics", "extrinsics", "ego_pose", "lidar",
                "sky_masks", "dynamic_masks"):
        (scene / sub).mkdir(parents=True)

    rng = np.random.default_rng(0)
    # camera 0 intrinsics in the ORIGINAL resolution (1280x1920)
    np.savetxt(scene / "intrinsics" / "0.txt",
               np.array([2000.0, 2000.0, 960.0, 640.0, 0, 0, 0, 0, 0]))
    cam_to_ego = np.eye(4)
    cam_to_ego[0, 3] = 1.5  # camera 1.5m forward of ego
    np.savetxt(scene / "extrinsics" / "0.txt", cam_to_ego)

    for t in range(4):
        ego = np.eye(4)
        ego[0, 3] = 100.0 + 2.0 * t  # world offset; should normalize away
        np.savetxt(scene / "ego_pose" / f"{t:03d}.txt", ego)
        img = (rng.uniform(0, 255, (64, 96, 3))).astype(np.uint8)
        Image.fromarray(img).save(scene / "images" / f"{t:03d}_0.jpg")
        Image.fromarray(
            (rng.uniform(0, 1, (64, 96)) > 0.5).astype(np.uint8) * 255
        ).save(scene / "sky_masks" / f"{t:03d}_0.png")
        Image.fromarray(np.zeros((64, 96), np.uint8)).save(
            scene / "dynamic_masks" / f"{t:03d}_0.png"
        )
        # lidar: N x 14 (origin, point, flow, class, ground, int, elong, id)
        n = 200
        pts = np.zeros((n, 14), np.float32)
        pts[:, 3] = rng.uniform(1, 60, n)  # x forward
        pts[:, 4] = rng.uniform(-20, 20, n)
        pts[:, 5] = rng.uniform(-2, 5, n)
        pts[:, 6:9] = rng.normal(0, 1, (n, 3))  # velocity
        pts[:, 13] = rng.integers(0, 2, n)  # laser id
        pts.tofile(scene / "lidar" / f"{t:03d}.bin")
    return tmp_path


def _cfg(fake_scene, *over):
    cfg = load_config(DEFAULT)
    cfg.merge_(
        __import__("emernerf_tpu.config", fromlist=["from_dotlist"]).from_dotlist(
            [
                f"data.data_root={fake_scene}",
                "data.scene_idx=0",
                "data.pixel_source.num_cams=1",
                "data.pixel_source.load_size=[32,48]",
                *over,
            ]
        )
    )
    return cfg


def test_load_waymo_scene(fake_scene):
    ds = load_waymo_dataset(_cfg(fake_scene))
    assert ds.images.shape == (4, 32, 48, 3)
    assert ds.sky_masks.shape == (4, 32, 48)
    assert ds.num_cams == 1 and ds.num_frames == 4

    # ego normalization: first pose at origin, +2m/frame along x
    np.testing.assert_allclose(ds.c2w[0][:3, 3], [1.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(ds.c2w[1][:3, 3], [3.5, 0, 0], atol=1e-6)

    # intrinsics scaled to load size: fx * 48/1920
    assert np.isclose(ds.intrinsics[0][0, 0], 2000.0 * 48 / 1920)

    # opencv->waymo: camera forward (z in opencv) must map to world +x
    np.testing.assert_allclose(ds.c2w[0][:3, :3] @ [0, 0, 1], [1, 0, 0],
                               atol=1e-6)

    # lidar is loaded, transformed, filtered
    assert ds.lidar is not None
    assert len(ds.lidar["ranges"]) > 0
    assert (ds.lidar["ranges"] > 0).all()
    # lidar origins at normalized ego positions
    assert ds.lidar["origins"][:, 0].max() <= 2.0 * 3 + 1e-3


def test_top_lidar_filter(fake_scene):
    ds_all = load_waymo_dataset(_cfg(fake_scene))
    ds_top = load_waymo_dataset(
        _cfg(fake_scene, "data.lidar_source.only_use_top_lidar=true")
    )
    assert len(ds_top.lidar["ranges"]) < len(ds_all.lidar["ranges"])


def test_test_split_stride(fake_scene):
    ds = load_waymo_dataset(
        _cfg(fake_scene, "data.pixel_source.test_image_stride=2")
    )
    # frames 0 and 2 become test
    assert set(ds.test_frames.tolist()) == {0, 2}
    assert len(ds.train_indices) == 2 and len(ds.test_indices) == 2
    assert ds.has_test_split


def test_notr_split_data_ships_with_repo():
    """The NOTR scene list + split definitions (pure data, mirrored from the
    reference data/ directory) exist and parse through the downloader's
    readers with consistent scene ids."""
    import os

    from emernerf_tpu.tools.download_waymo import (
        read_scene_list,
        read_split_file,
    )

    root = os.path.join(os.path.dirname(__file__), "..", "data")
    names = read_scene_list(os.path.join(root, "waymo_train_list.txt"))
    assert len(names) == 798
    assert all(n.startswith("segment-") for n in names[:5])

    for split, expected in [("static32", 32), ("dynamic32", 32),
                            ("diverse56", 56)]:
        ids = read_split_file(
            os.path.join(root, "waymo_splits", f"{split}.txt")
        )
        assert len(ids) == expected
        assert all(0 <= i < len(names) for i in ids)


def test_get_valid_lidar_mask_projects_points():
    """Points in front of the camera inside the frustum are valid; points
    behind or far off-axis are not (ref datasets/waymo.py:638-668)."""
    import numpy as np

    from emernerf_tpu.data.dataset import SceneDataset

    h, w = 20, 30
    intr = np.array([[20.0, 0, 15.0], [0, 20.0, 10.0], [0, 0, 1.0]])
    c2w = np.eye(4)  # camera at origin looking +z (OpenCV convention)
    ds = SceneDataset(
        images=np.zeros((1, h, w, 3), np.float32),
        c2w=c2w[None],
        intrinsics=intr[None],
        frame_idx=np.array([0]),
        cam_ids=np.array([0]),
    )
    pts = np.array(
        [
            [0.0, 0.0, 5.0],    # straight ahead -> valid
            [0.0, 0.0, -5.0],   # behind -> invalid
            [100.0, 0.0, 5.0],  # far off-axis -> invalid
        ]
    )
    mask = ds.get_valid_lidar_mask(0, pts)
    assert mask.tolist() == [True, False, False]
