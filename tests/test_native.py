"""Native (C++) wire-codec layer: known-answer, differential, and
malformed-input tests against the pure-Python implementation.

The native module is an accelerator with a mandatory pure-Python fallback
(emernerf_tpu/native/__init__.py); these tests pin the two paths to each
other so neither can drift."""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emernerf_tpu import native
from emernerf_tpu.tools import waymo_wire as ww

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native wirecodec unavailable (no g++?)"
)


# --------------------------------------------------------------------- #
# CRC32C
# --------------------------------------------------------------------- #
def test_crc32c_known_answers():
    # RFC 3720 (iSCSI) test vectors
    assert native.crc32c(b"") == 0
    assert native.crc32c(b"123456789") == 0xE3069283
    assert native.crc32c(bytes(32)) == 0x8A9136AA
    assert native.crc32c(bytes([0xFF] * 32)) == 0x62A8AB43


def test_crc32c_matches_python_all_lengths():
    rng = np.random.default_rng(0)
    for n in (1, 2, 7, 8, 9, 63, 64, 65, 1000, 4097):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.crc32c(data) == ww._crc32c(data), n


def test_masked_crc_matches_python():
    data = b"payload bytes for masking"
    py = ww._crc32c(data)
    py_masked = ((py >> 15 | py << 17) + 0xA282EAD8) & 0xFFFFFFFF
    assert native.masked_crc(data) == py_masked


# --------------------------------------------------------------------- #
# protobuf field scan + decode differential
# --------------------------------------------------------------------- #
def _tree_equal(a, b, path="root"):
    """Structural equality of decoded SimpleNamespace trees."""
    if type(a).__name__ == "SimpleNamespace":
        assert type(b).__name__ == "SimpleNamespace", path
        assert vars(a).keys() == vars(b).keys(), path
        for k in vars(a):
            _tree_equal(getattr(a, k), getattr(b, k), f"{path}.{k}")
    elif isinstance(a, list):
        assert isinstance(b, list) and len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _tree_equal(x, y, f"{path}[{i}]")
    elif isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=path)
    else:
        assert a == b, f"{path}: {a!r} != {b!r}"


def _random_frame_values(rng):
    return {
        "context": {
            "name": "segment-" + str(int(rng.integers(1e9))),
            "camera_calibrations": [
                {
                    "name": int(c),
                    "intrinsic": rng.normal(size=9).tolist(),
                    "extrinsic": {"transform": rng.normal(size=16).tolist()},
                    "width": 1920,
                    "height": 1280,
                    "rolling_shutter_direction": 1,
                }
                for c in range(1, 4)
            ],
            "laser_calibrations": [
                {
                    "name": 1,
                    "beam_inclinations": rng.normal(size=64).tolist(),
                    "extrinsic": {"transform": rng.normal(size=16).tolist()},
                }
            ],
        },
        "timestamp_micros": int(rng.integers(1 << 40)),
        "pose": {"transform": rng.normal(size=16).tolist()},
        "images": [
            {
                "name": 1,
                "image": rng.integers(0, 256, 1000, dtype=np.uint8).tobytes(),
                "pose_timestamp": float(rng.normal()),
            }
        ],
        "laser_labels": [
            {
                "box": {
                    "center_x": float(rng.normal()),
                    "center_y": float(rng.normal()),
                    "heading": float(rng.normal()),
                },
                "metadata": {"speed_x": float(rng.normal())},
                "type": 1,
                "id": "label-x",
                "num_lidar_points_in_box": int(rng.integers(100)),
                "num_top_lidar_points_in_box": int(rng.integers(100)),
            }
        ],
    }


def test_decode_native_matches_python_on_random_frames():
    rng = np.random.default_rng(1)
    for _ in range(5):
        buf = ww.encode_frame(_random_frame_values(rng))
        _tree_equal(
            ww._decode_native(memoryview(buf), "Frame"),
            ww._decode_py(buf, "Frame"),
        )


def test_decode_negative_varints_match():
    buf = ww.encode(
        "Label",
        {"num_lidar_points_in_box": -5, "num_top_lidar_points_in_box": -1},
    )
    a = ww._decode_native(memoryview(buf), "Label")
    b = ww._decode_py(buf, "Label")
    assert a.num_lidar_points_in_box == b.num_lidar_points_in_box == -5
    assert a.num_top_lidar_points_in_box == -1


def test_scan_fields_spans():
    buf = ww.encode("MatrixShape", {"dims": [2, 3, 4]})
    fnum, wtyp, off, ln, val = native.scan_fields(buf)
    assert fnum.tolist() == [1]
    assert wtyp.tolist() == [2]  # packed
    payload = buf[int(off[0]): int(off[0]) + int(ln[0])]
    assert native.decode_varints(payload).tolist() == [2, 3, 4]


def test_scan_fields_rejects_malformed():
    with pytest.raises(ValueError):
        native.scan_fields(b"\x0a\xff")  # length-delimited, truncated
    with pytest.raises(ValueError):
        native.scan_fields(b"\x80")  # truncated varint tag
    with pytest.raises(ValueError):
        native.scan_fields(b"\x0b")  # wire type 3 (group): unsupported


# --------------------------------------------------------------------- #
# TFRecord indexing
# --------------------------------------------------------------------- #
def test_tfrecord_index_matches_python_reader(tmp_path):
    recs = [b"a", b"", b"x" * 1000, bytes(range(256))]
    p = str(tmp_path / "t.tfrecord")
    ww.write_tfrecords(p, recs)
    raw = open(p, "rb").read()
    offsets, lengths = native.tfrecord_index(raw, verify=2)
    got = [raw[o: o + l] for o, l in zip(offsets.tolist(), lengths.tolist())]
    assert got == recs


def test_tfrecord_index_detects_corruption(tmp_path):
    p = str(tmp_path / "t.tfrecord")
    ww.write_tfrecords(p, [b"hello world"])
    raw = bytearray(open(p, "rb").read())
    raw[13] ^= 1  # payload byte
    with pytest.raises(ValueError, match="data CRC"):
        native.tfrecord_index(bytes(raw), verify=2)
    # verify=0 trusts the CRCs and still frames correctly
    offsets, lengths = native.tfrecord_index(bytes(raw), verify=0)
    assert lengths.tolist() == [11]
    with pytest.raises(ValueError, match="truncated"):
        native.tfrecord_index(bytes(raw[:-2]), verify=0)


def test_tfrecord_index_huge_length_no_overflow():
    """A corrupt record length near 2^64 must fail cleanly, not wrap the
    bounds-check addition and read out of bounds (ADVICE r3 #1).  Exercises
    every verify level: the unverified path walks the cursor, verify=2
    would CRC `len` bytes of the payload."""
    hdr = struct.pack("<Q", (1 << 64) - 8)  # len such that payload+len+4 wraps
    len_crc = ww._masked_crc(hdr)
    rec = hdr + struct.pack("<I", len_crc) + b"payload!" + bytes(4)
    for verify in (0, 1, 2):
        with pytest.raises(ValueError, match="truncated"):
            native.tfrecord_index(rec, verify=verify)


def test_scan_fields_huge_length_no_overflow():
    """Length-delimited field whose declared length wraps i + ln (ADVICE
    r3 #1, en_scan_fields sibling)."""
    # field 1, wire 2, varint length 2^64-1
    buf = b"\x0a" + b"\xff" * 9 + b"\x01" + b"x"
    with pytest.raises(ValueError):
        native.scan_fields(buf)


def test_fallback_decode_is_default_compatible(tmp_path):
    """waymo_wire.decode dispatches by availability; both implementations
    produce the same tree for the fixture encoder's output."""
    rng = np.random.default_rng(2)
    buf = ww.encode_frame(_random_frame_values(rng))
    _tree_equal(ww.decode(buf, "Frame"), ww._decode_py(buf, "Frame"))
