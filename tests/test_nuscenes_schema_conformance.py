"""NuScenes reader conformance against DOC-TRANSCRIBED records.

Fixture provenance (VERDICT r2 #8): every field name, type, and example
value below is transcribed from the PUBLIC nuScenes schema documentation
(nuscenes.org/nuscenes#data-format; `schema_nuscenes.md` in the
nuscenes-devkit repo), NOT from this repo's reader code — so a shared
misunderstanding between `nuscenes_devkit_lite.py` and its
builder-authored fixtures cannot self-confirm here.  Documented facts
exercised:

* `sample` records on disk carry token/timestamp/prev/next/scene_token
  and NO `data` field — the devkit's `__make_reverse_index__` adds it;
* `sample_data` carries `filename` (not file_name), `fileformat`,
  `is_key_frame`, `height`/`width` (0 for non-camera), `ego_pose_token`,
  `calibrated_sensor_token`, and prev/next chain tokens ("" terminated);
* `calibrated_sensor` carries `translation` [3], `rotation` as a
  [w, x, y, z] quaternion, and `camera_intrinsic` — a 3x3 nested list
  for cameras, an EMPTY list for lidar/radar;
* `ego_pose` carries token/timestamp/rotation/translation;
* `sensor` carries `channel` (e.g. "CAM_FRONT") and `modality`
  ("camera" | "lidar" | "radar");
* tokens are 32-char lowercase hex strings; timestamps are integer
  MICROseconds (16 digits in 2018 data);
* lidar key frames live under `samples/LIDAR_TOP/...pcd.bin` while their
  `fileformat` field says "pcd" (documented quirk).
"""

import json
import math
import os

import numpy as np
import pytest

from emernerf_tpu.data.nuscenes import build_camera_meta, build_lidar_meta
from emernerf_tpu.data.nuscenes_devkit_lite import NuScenesLite

# ---------------------------------------------------------------------- #
# doc-transcribed records.  Example values follow the schema docs' own
# examples (v1.0-mini, scene-0061 naming pattern); chain tokens are
# synthesized 32-hex strings to form a consistent 2-keyframe scene.
# ---------------------------------------------------------------------- #

T = {  # tokens: 32-char hex, as documented
    "log": "7e25a2c8ea1f41c5b0da1e69ecfa71a2",
    "scene": "cc8c0bf57f984915a77078b10eb33198",
    "samp0": "ca9a282c9e77460f8360f564131a8af5",
    "samp1": "39586f9d59004284a7114a68825e8eec",
    "sen_cam": "725903f5b62f56118f4094b46a4470d8",
    "sen_lid": "dc8b396651c05aedbb9cdaae573bb567",
    "cal_cam": "1d31c729b073425e8e0202c5c6e66ee1",
    "cal_lid": "f4d2a6c281f34a7eb8bb033d82321f79",
    "ego00": "5ace90b379af485b9dcb1584b01e7212",
    "ego01": "37091c75b9704e0daa829ba56dfa0906",
    "ego10": "bddd80ae33ec4e32b27fdb3c1160a30e",
    "ego11": "9d9bf11fb0e144c8b446d54a8a00184f",
    "sd_c0": "e3d495d4ac534d54b321f50006683844",
    "sd_c1": "aac7867ebf4f446395d29fbd60b63b3b",
    "sd_l0": "9d9bf11fb0e144c8b446d54a8a001777",
    "sd_l1": "7d9bf11fb0e144c8b446d54a8a001888",
}

NAME = "n015-2018-07-24-11-22-45+0800"
TS0 = 1532402927612460  # microseconds, as documented
TS1 = 1532402928112460


def _cam_file(ts, cam="CAM_FRONT"):
    return f"samples/{cam}/{NAME}__{cam}__{ts}.jpg"


def _cam_tok(kind, cam):
    """Deterministic 32-hex token per (kind, camera)."""
    import hashlib

    return hashlib.md5(f"{kind}-{cam}".encode()).hexdigest()


def _lid_file(ts):
    return f"samples/LIDAR_TOP/{NAME}__LIDAR_TOP__{ts}.pcd.bin"


def doc_tables():
    scene = [{
        "token": T["scene"],
        "log_token": T["log"],
        "nbr_samples": 2,
        "first_sample_token": T["samp0"],
        "last_sample_token": T["samp1"],
        "name": "scene-0061",
        "description": "Parked truck, construction, intersection",
    }]
    # NOTE: no "data" field — the devkit adds it in its reverse index
    sample = [
        {"token": T["samp0"], "timestamp": TS0, "prev": "",
         "next": T["samp1"], "scene_token": T["scene"]},
        {"token": T["samp1"], "timestamp": TS1, "prev": T["samp0"],
         "next": "", "scene_token": T["scene"]},
    ]
    # all six documented camera channels (the walk visits each)
    cams = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
            "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"]
    sensor = [
        {"token": _cam_tok("sen", c), "channel": c, "modality": "camera"}
        for c in cams
    ] + [
        {"token": T["sen_lid"], "channel": "LIDAR_TOP",
         "modality": "lidar"},
    ]
    # rotation is a [w, x, y, z] quaternion (documented); intrinsic is a
    # 3x3 nested list for cameras and [] for lidar (documented)
    calibrated_sensor = [
        {"token": _cam_tok("cal", c), "sensor_token": _cam_tok("sen", c),
         "translation": [1.70079118954, 0.0159456324149, 1.51095763913],
         "rotation": [0.4998015430569128, -0.5030316162024876,
                      0.4997798114386805, -0.49737083824542755],
         "camera_intrinsic": [
             [1266.417203046554, 0.0, 816.2670197447984],
             [0.0, 1266.417203046554, 491.50706579294757],
             [0.0, 0.0, 1.0],
         ]}
        for c in cams
    ] + [
        {"token": "UNUSED_cal_cam", "sensor_token": "UNUSED",
         "translation": [1.70079118954, 0.0159456324149, 1.51095763913],
         "rotation": [0.4998015430569128, -0.5030316162024876,
                      0.4997798114386805, -0.49737083824542755],
         "camera_intrinsic": []},
        {"token": T["cal_lid"], "sensor_token": T["sen_lid"],
         "translation": [0.943713, 0.0, 1.84023],
         "rotation": [0.7077955119163518, -0.006492242056004365,
                      0.010646214713995808, -0.7063073142877817],
         "camera_intrinsic": []},
    ]
    ego_pose = [
        {"token": tok, "timestamp": ts,
         "rotation": [math.cos(th / 2), 0.0, 0.0, math.sin(th / 2)],
         "translation": [410.0 + 5.0 * i, 1180.0, 0.0]}
        for i, (tok, ts, th) in enumerate([
            (T["ego00"], TS0, 0.00),
            (T["ego01"], TS0 + 35000, 0.00),
            (T["ego10"], TS1, 0.02),
            (T["ego11"], TS1 + 35000, 0.02),
        ])
    ]
    sample_data = [
        rec
        for c in cams
        for rec in (
            {"token": _cam_tok("sd0", c), "sample_token": T["samp0"],
             "ego_pose_token": T["ego00"],
             "calibrated_sensor_token": _cam_tok("cal", c),
             "timestamp": TS0, "fileformat": "jpg", "is_key_frame": True,
             "height": 900, "width": 1600, "filename": _cam_file(TS0, c),
             "prev": "", "next": _cam_tok("sd1", c)},
            {"token": _cam_tok("sd1", c), "sample_token": T["samp1"],
             "ego_pose_token": T["ego10"],
             "calibrated_sensor_token": _cam_tok("cal", c),
             "timestamp": TS1, "fileformat": "jpg", "is_key_frame": True,
             "height": 900, "width": 1600, "filename": _cam_file(TS1, c),
             "prev": _cam_tok("sd0", c), "next": ""},
        )
    ] + [
        # lidar: height/width 0, fileformat "pcd", filename *.pcd.bin
        {"token": T["sd_l0"], "sample_token": T["samp0"],
         "ego_pose_token": T["ego01"],
         "calibrated_sensor_token": T["cal_lid"],
         "timestamp": TS0 + 35000, "fileformat": "pcd",
         "is_key_frame": True, "height": 0, "width": 0,
         "filename": _lid_file(TS0 + 35000),
         "prev": "", "next": T["sd_l1"]},
        {"token": T["sd_l1"], "sample_token": T["samp1"],
         "ego_pose_token": T["ego11"],
         "calibrated_sensor_token": T["cal_lid"],
         "timestamp": TS1 + 35000, "fileformat": "pcd",
         "is_key_frame": True, "height": 0, "width": 0,
         "filename": _lid_file(TS1 + 35000),
         "prev": T["sd_l0"], "next": ""},
    ]
    return {
        "scene": scene, "sample": sample, "sensor": sensor,
        "calibrated_sensor": calibrated_sensor, "ego_pose": ego_pose,
        "sample_data": sample_data,
    }


@pytest.fixture()
def doc_root(tmp_path):
    root = tmp_path / "nusc"
    tdir = root / "v1.0-mini"
    tdir.mkdir(parents=True)
    for name, records in doc_tables().items():
        with open(tdir / f"{name}.json", "w") as f:
            json.dump(records, f)
    return str(root)


def test_lite_reader_conforms_to_documented_schema(doc_root):
    nusc = NuScenesLite("v1.0-mini", doc_root)
    # raw sample records had no "data"; the reverse index must add the
    # key-frame mapping exactly like the devkit
    s0 = nusc.get("sample", T["samp0"])
    assert s0["data"]["CAM_FRONT"] == _cam_tok("sd0", "CAM_FRONT")
    assert s0["data"]["LIDAR_TOP"] == T["sd_l0"]
    # channel/modality stamps
    sd = nusc.get("sample_data", T["sd_l0"])
    assert sd["channel"] == "LIDAR_TOP"
    assert sd["sensor_modality"] == "lidar"
    assert nusc.get("scene", T["scene"])["name"] == "scene-0061"


def test_meta_walk_over_documented_records(doc_root):
    nusc = NuScenesLite("v1.0-mini", doc_root)
    scene = nusc.scene[0]
    cam_meta = build_camera_meta(nusc, scene)
    m = cam_meta["CAM_FRONT"]
    assert m["filepath"] == [_cam_file(TS0), _cam_file(TS1)]
    assert sorted(cam_meta) == sorted(
        ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
         "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"])
    assert m["timestamp"] == [TS0, TS1]
    k = np.asarray(m["intrinsics"][0])
    assert k.shape == (3, 3) and k[0, 0] == pytest.approx(1266.417203046554)
    # extrinsics: 4x4 from the documented [w, x, y, z] quaternion — the
    # cam calibration above is the nuScenes CAM_FRONT mounting (camera
    # looking +x of ego): R @ [0,0,1] (cam forward) ~ ego +x
    R = np.asarray(m["extrinsics"][0])[:3, :3]
    fwd = R @ np.array([0.0, 0.0, 1.0])
    assert fwd[0] > 0.99, f"wrong quaternion convention: forward={fwd}"

    lidar_meta = build_lidar_meta(nusc, scene)
    assert lidar_meta["filepath"][0].endswith(".pcd.bin")
    assert len(lidar_meta["timestamp"]) == 2
    # fixture ego poses advance 5 m per record; the lidar keyframes use
    # records 1 and 3 -> 10 m apart
    p0 = np.asarray(lidar_meta["ego_pose"][0])[:3, 3]
    p1 = np.asarray(lidar_meta["ego_pose"][1])[:3, 3]
    assert p1[0] - p0[0] == pytest.approx(10.0)
