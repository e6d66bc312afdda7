"""Full-pipeline Waymo integration test from raw bytes the repo constructs:

hand-encoded Frame protos -> TFRecord (masked-CRC framing) ->
WaymoProcessor.convert_one (pure-Python wire backend) ->
load_waymo_dataset -> CLI trainer for a few steps.

This is the miniature stand-in for a real scene-flow TFRecord (none ship in
this container); it exercises the same decode path the reference drives
through tensorflow + waymo_open_dataset
(/root/reference/datasets/waymo_preprocess.py:518-699).
"""

import io
import json
import os
import sys
import zlib

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emernerf_tpu.tools import waymo_wire as ww
from emernerf_tpu.tools.preprocess import WaymoProcessor

H_RI, W_RI = 8, 32  # range image size
NUM_FRAMES = 3


def _jpeg_bytes(rng, hw=(64, 96)):
    img = rng.uniform(0, 255, (*hw, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG")
    return buf.getvalue()


def _transform(mat):
    return {"transform": np.asarray(mat, np.float64).reshape(-1).tolist()}


def _range_image(rng):
    """(H, W, 4): range, intensity, elongation, nlz."""
    ri = np.zeros((H_RI, W_RI, 4), np.float32)
    ri[..., 0] = rng.uniform(2.0, 60.0, (H_RI, W_RI))
    ri[..., 0][rng.uniform(size=(H_RI, W_RI)) < 0.2] = -1.0  # no-return
    ri[..., 1] = rng.uniform(0, 1, (H_RI, W_RI))
    ri[..., 2] = rng.uniform(0, 0.3, (H_RI, W_RI))
    return ri


def _flow_image(rng):
    """(H, W, 4): vx, vy, vz (m/s), class (-1 = no label)."""
    fl = np.zeros((H_RI, W_RI, 4), np.float32)
    fl[..., :3] = rng.normal(0, 2.0, (H_RI, W_RI, 3))
    fl[..., 3] = rng.integers(-1, 3, (H_RI, W_RI)).astype(np.float32)
    return fl


def build_fixture_tfrecord(path, num_frames=NUM_FRAMES):
    """Write a miniature but full-schema scene TFRecord; returns per-frame
    ground truth {flow_images, range_images, poses} for assertions."""
    rng = np.random.default_rng(0)
    cam_to_vehicle = np.eye(4)
    cam_to_vehicle[0, 3] = 1.5  # camera 1.5 m forward (Waymo cam: x fwd)
    laser_to_vehicle = np.eye(4)
    laser_to_vehicle[2, 3] = 2.0

    context = {
        "name": "fixture-seg-000",
        "camera_calibrations": [
            {
                "name": 1,  # FRONT
                "intrinsic": [2000.0, 2000.0, 960.0, 640.0, 0, 0, 0, 0, 0],
                "extrinsic": _transform(cam_to_vehicle),
                "width": 1920,
                "height": 1280,
            }
        ],
        "laser_calibrations": [
            {
                "name": 1,  # TOP
                "beam_inclinations": np.linspace(
                    -0.3, 0.1, H_RI
                ).tolist(),
                "beam_inclination_min": -0.3,
                "beam_inclination_max": 0.1,
                "extrinsic": _transform(laser_to_vehicle),
            }
        ],
    }

    truth = {"flow": [], "range": [], "pose": []}
    records = []
    for t in range(num_frames):
        pose = np.eye(4)
        pose[0, 3] = 50.0 + 2.0 * t  # ego drives +x; normalizes away
        ri = _range_image(rng)
        fl = _flow_image(rng)
        truth["flow"].append(fl)
        truth["range"].append(ri)
        truth["pose"].append(pose)

        frame = {
            "context": context,
            "timestamp_micros": 1_000_000 * t,
            "pose": _transform(pose),
            "images": [{"name": 1, "image": _jpeg_bytes(rng)}],
            "lasers": [
                {
                    "name": 1,
                    "ri_return1": {
                        "range_image_compressed": zlib.compress(
                            ww.encode_matrix_float(ri)
                        ),
                        "range_image_flow_compressed": zlib.compress(
                            ww.encode_matrix_float(fl)
                        ),
                    },
                }
            ],
            "laser_labels": [
                {  # moving vehicle 10 m ahead -> dynamic mask
                    "box": {
                        "center_x": 12.0, "center_y": 0.0, "center_z": 1.0,
                        "length": 5.0, "width": 2.0, "height": 1.8,
                        "heading": 0.3,
                    },
                    "metadata": {"speed_x": 5.0, "speed_y": 0.0},
                    "type": 1,
                    "id": "moving-car",
                    "num_lidar_points_in_box": 40,
                    "num_top_lidar_points_in_box": 25,
                },
                {  # parked vehicle -> ignored
                    "box": {
                        "center_x": 20.0, "center_y": 3.0, "center_z": 1.0,
                        "length": 5.0, "width": 2.0, "height": 1.8,
                        "heading": 0.0,
                    },
                    "metadata": {"speed_x": 0.0, "speed_y": 0.0},
                    "type": 1,
                    "id": "parked-car",
                    "num_lidar_points_in_box": 30,
                    "num_top_lidar_points_in_box": 12,
                },
            ],
        }
        records.append(ww.encode_frame(frame))
    ww.write_tfrecords(path, records)
    return truth


# ----------------------------------------------------------------------- #
def test_tfrecord_roundtrip_and_crc(tmp_path):
    p = str(tmp_path / "x.tfrecord")
    recs = [b"hello", b"", bytes(range(256)) * 7]
    ww.write_tfrecords(p, recs)
    assert list(ww.read_tfrecords(p)) == recs
    # corrupt one payload byte -> CRC failure
    raw = bytearray(open(p, "rb").read())
    raw[14] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="CRC"):
        list(ww.read_tfrecords(p))


def test_frame_codec_roundtrip(tmp_path):
    p = str(tmp_path / "scene.tfrecord")
    truth = build_fixture_tfrecord(p)
    frames = [ww.parse_frame(r) for r in ww.read_tfrecords(p)]
    assert len(frames) == NUM_FRAMES
    f0 = frames[0]
    assert f0.context.name == "fixture-seg-000"
    cc = f0.context.camera_calibrations[0]
    assert (cc.name, cc.width, cc.height) == (1, 1920, 1280)
    np.testing.assert_allclose(cc.intrinsic[:4], [2000, 2000, 960, 640])
    np.testing.assert_allclose(
        np.asarray(f0.pose.transform).reshape(4, 4), truth["pose"][0]
    )
    assert f0.laser_labels[0].metadata.speed_x == 5.0
    assert f0.laser_labels[0].box.length == 5.0
    assert f0.laser_labels[0].box.width == 2.0
    assert f0.laser_labels[1].metadata.speed_x == 0.0
    # frame_utils equivalent decodes the range image stack
    ri, _, _, top_pose = ww.parse_range_image_and_camera_projection(f0)
    assert top_pose is None
    got = np.asarray(ri[1][0].data, np.float32).reshape(ri[1][0].shape.dims)
    np.testing.assert_allclose(got, truth["range"][0])


@pytest.fixture(scope="module")
def converted_scene(tmp_path_factory):
    """TFRecord -> WaymoProcessor -> preprocessed scene directory."""
    root = tmp_path_factory.mktemp("waymo_e2e")
    raw = root / "raw"
    raw.mkdir()
    truth = build_fixture_tfrecord(str(raw / "fixture-seg-000.tfrecord"))
    out = root / "processed"
    proc = WaymoProcessor(str(raw), str(out), [0], ["fixture-seg-000"],
                          workers=1, require_flow=True)
    proc.convert_one(0)
    return out, truth


def test_convert_one_writes_reference_layout(converted_scene):
    out, truth = converted_scene
    scene = out / "000"
    for t in range(NUM_FRAMES):
        assert (scene / "images" / f"{t:03d}_0.jpg").exists()
        assert (scene / "ego_pose" / f"{t:03d}.txt").exists()
        assert (scene / "lidar" / f"{t:03d}.bin").exists()
        assert (scene / "dynamic_masks" / f"{t:03d}_0.png").exists()
    assert (scene / "intrinsics" / "0.txt").exists()
    assert (scene / "extrinsics" / "0.txt").exists()

    # lidar bin: Nx14, ranges in plausible bounds, flows preserved
    rows = np.fromfile(scene / "lidar" / "000.bin", np.float32).reshape(-1, 14)
    valid = truth["range"][0][..., 0] > 0
    assert len(rows) == valid.sum()
    # flow columns carry the encoded velocities for valid returns
    np.testing.assert_allclose(
        rows[:, 6:9], truth["flow"][0][..., :3][valid], atol=1e-5
    )
    np.testing.assert_allclose(
        rows[:, 9], truth["flow"][0][..., 3][valid], atol=1e-5
    )
    # laser extrinsic z-offset: origins at the sensor, 2 m up
    np.testing.assert_allclose(rows[:, 2], 2.0, atol=1e-5)
    # point distances match the encoded ranges
    d = np.linalg.norm(rows[:, 3:6] - rows[:, :3], axis=-1)
    np.testing.assert_allclose(d, truth["range"][0][..., 0][valid], rtol=1e-4)

    # dynamic mask: moving box rasterized, parked box not filling everything
    mask = np.asarray(Image.open(scene / "dynamic_masks" / "000_0.png"))
    assert mask.shape == (1280, 1920)
    assert (mask > 0).any()
    assert (mask > 0).mean() < 0.5


@pytest.mark.slow
def test_converted_scene_trains(converted_scene, tmp_path):
    """The converted fixture drives the real CLI trainer end to end."""
    out, _ = converted_scene
    from train_emernerf import get_args_parser, main

    overrides = [
        "data.dataset=waymo",
        f"data.data_root={out}",
        "data.scene_idx=0",
        "data.pixel_source.num_cams=1",
        "data.pixel_source.load_size=[32,48]",
        "data.pixel_source.load_sky_mask=false",
        "data.ray_batch_size=128",
        "data.lidar_source.lidar_ray_batch_size=64",
        "nerf.model.xyz_encoder.n_levels=4",
        "nerf.model.xyz_encoder.log2_hashmap_size=12",
        "nerf.model.xyz_encoder.max_resolution=128",
        "nerf.propnet.num_samples_per_prop=[16]",
        "nerf.propnet.xyz_encoder.n_levels_per_prop=[3]",
        "nerf.propnet.xyz_encoder.max_resolution_per_prop=[64]",
        "nerf.propnet.xyz_encoder.lgo2_hashmap_size_per_prop=[12]",
        "nerf.propnet.xyz_encoder.base_resolutions_per_prop=[8]",
        "nerf.sampling.num_samples=8",
        "nerf.model.neck.geometry_feature_dim=16",
        "nerf.model.neck.base_mlp_layer_width=16",
        "nerf.model.head.head_mlp_layer_width=16",
        "optim.num_iters=10",
        "optim.cache_rgb_freq=1000",
        "logging.print_freq=5",
        "logging.saveckpt_freq=0",
        "render.render_chunk_size=600",
        "render.render_full=false",
        "render.render_test=false",
        "render.render_lowres=false",
    ]
    args = get_args_parser().parse_args(
        ["--output_root", str(tmp_path), "--project", "p", "--run_name", "r"]
        + overrides
    )
    main(args)
    run_dir = tmp_path / "p" / "r"
    assert (run_dir / "config.yaml").exists()
    metrics = [
        json.loads(line)
        for line in (run_dir / "metrics.json").read_text().splitlines()
    ]
    assert metrics and np.isfinite(metrics[-1]["psnr"])
    assert np.isfinite(metrics[-1]["total_lidar_loss"])
