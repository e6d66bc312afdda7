#!/usr/bin/env python
"""Wire-codec throughput: native C++ core vs pure-Python fallback.

Builds a realistically-sized synthetic Waymo Frame (3 cameras with ~1MB
JPEG-sized blobs, 2 lidar returns of 64x2650x4 float32 range images,
per-pixel pose, labels), writes a TFRecord of N frames, and times:

  * TFRecord read (framing + masked-CRC verification)
  * Frame decode (schema walk)
  * end-to-end read+decode MB/s

Writes perf/WIRE_BENCH.json.  CPU-only; safe to run while the chip is busy.
"""

import json
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emernerf_tpu.tools import waymo_wire as ww
from emernerf_tpu import native


def make_frame(rng) -> bytes:
    def mf(arr):
        return zlib.compress(ww.encode_matrix_float(arr), 1)

    ri = rng.normal(size=(64, 2650, 4)).astype(np.float32)
    pose_ri = rng.normal(size=(64, 2650, 6)).astype(np.float32)
    values = {
        "context": {
            "name": "segment-bench",
            "camera_calibrations": [
                {
                    "name": c,
                    "intrinsic": rng.normal(size=9).tolist(),
                    "extrinsic": {"transform": np.eye(4).reshape(-1).tolist()},
                    "width": 1920,
                    "height": 1280,
                }
                for c in range(1, 4)
            ],
            "laser_calibrations": [
                {
                    "name": 1,
                    "beam_inclinations": rng.normal(size=64).tolist(),
                    "extrinsic": {"transform": np.eye(4).reshape(-1).tolist()},
                }
            ],
        },
        "timestamp_micros": 1_600_000_000_000_000,
        "pose": {"transform": np.eye(4).reshape(-1).tolist()},
        "images": [
            {
                "name": c,
                "image": rng.integers(0, 256, 1_000_000, np.uint8).tobytes(),
                "pose": {"transform": np.eye(4).reshape(-1).tolist()},
                "pose_timestamp": 0.5,
            }
            for c in range(1, 4)
        ],
        "lasers": [
            {
                "name": 1,
                "ri_return1": {
                    "range_image_compressed": mf(ri),
                    "range_image_pose_compressed": mf(pose_ri),
                },
                "ri_return2": {"range_image_compressed": mf(ri)},
            }
        ],
        "laser_labels": [
            {
                "box": {"center_x": 1.0, "center_y": 2.0, "length": 4.0},
                "metadata": {"speed_x": 1.0},
                "type": 1,
                "id": f"label-{i}",
                "num_top_lidar_points_in_box": 50,
            }
            for i in range(60)
        ],
    }
    return ww.encode_frame(values)


def time_it(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    n_frames = int(os.environ.get("WIRE_FRAMES", "4"))
    frames = [make_frame(rng) for _ in range(n_frames)]
    path = "/tmp/wire_bench.tfrecord"
    ww.write_tfrecords(path, frames)
    mb = os.path.getsize(path) / 1e6

    out = {"file_mb": round(mb, 1), "frames": n_frames,
           "native_available": native.available()}

    # --- TFRecord read (framing + CRC) ---
    def read_native():
        assert sum(len(r) for r in ww.read_tfrecords(path)) > 0

    def read_py():
        raw = open(path, "rb").read()
        i, total = 0, 0
        import struct
        while i < len(raw):
            (ln,) = struct.unpack_from("<Q", raw, i)
            head = raw[i:i + 8]
            (len_crc,) = struct.unpack_from("<I", raw, i + 8)
            crc = ww._crc32c(head)
            assert ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF == len_crc
            rec = raw[i + 12: i + 12 + ln]
            crc = ww._crc32c(rec)
            total += len(rec)
            i += 12 + ln + 4
        assert total > 0

    if native.available():
        t = time_it(read_native)
        out["tfrecord_read_native_mb_s"] = round(mb / t, 1)
    t = time_it(read_py, reps=1)
    out["tfrecord_read_python_mb_s"] = round(mb / t, 1)

    # --- Frame decode ---
    buf = frames[0]
    fmb = len(buf) / 1e6
    if native.available():
        t = time_it(lambda: ww._decode_native(memoryview(buf), "Frame"))
        out["decode_native_mb_s"] = round(fmb / t, 1)
    t = time_it(lambda: ww._decode_py(buf, "Frame"), reps=1)
    out["decode_python_mb_s"] = round(fmb / t, 1)

    # --- range-image decompression+decode (the preprocess hot loop) ---
    frame = ww.parse_frame(frames[0])
    t = time_it(lambda: ww.parse_range_image_and_camera_projection(frame))
    out["range_image_parse_s"] = round(t, 4)

    if native.available():
        out["read_speedup"] = round(
            out["tfrecord_read_native_mb_s"] / out["tfrecord_read_python_mb_s"], 1
        )
        out["decode_speedup"] = round(
            out["decode_native_mb_s"] / out["decode_python_mb_s"], 1
        )
    path_out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "WIRE_BENCH.json")
    with open(path_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
