"""Scene-flow range-image decoding in the offline Waymo preprocessor.

Round 1 silently wrote all-zero flows because the standard range-image
parser never exposes the separate ``range_image_flow_compressed`` field
(reference decodes it at /root/reference/datasets/waymo_preprocess.py:255-301).
These tests encode a MatrixFloat proto by hand (wire format) and verify the
self-contained decoder recovers it, including through a stubbed Frame.
"""

import struct
import zlib
from types import SimpleNamespace

import numpy as np
import pytest

from emernerf_tpu.tools.preprocess import (
    parse_flow_range_images,
    parse_matrix_float,
)


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def encode_matrix_float(data: np.ndarray, dims) -> bytes:
    """MatrixFloat {repeated float data = 1 [packed]; MatrixShape shape = 2}
    with MatrixShape {repeated int32 dims = 1 [packed]} — hand-encoded
    protobuf wire format."""
    payload = struct.pack(f"<{data.size}f", *data.reshape(-1).tolist())
    msg = bytes([0x0A]) + _varint(len(payload)) + payload
    dims_payload = b"".join(_varint(d) for d in dims)
    shape_msg = bytes([0x0A]) + _varint(len(dims_payload)) + dims_payload
    msg += bytes([0x12]) + _varint(len(shape_msg)) + shape_msg
    return msg


def test_parse_matrix_float_roundtrip():
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(4, 6, 4)).astype(np.float32)
    data, dims = parse_matrix_float(encode_matrix_float(arr, arr.shape))
    assert dims == [4, 6, 4]
    np.testing.assert_array_equal(data.reshape(dims), arr)


def test_parse_flow_range_images_from_stub_frame():
    rng = np.random.default_rng(1)
    flow = rng.normal(size=(8, 16, 4)).astype(np.float32)
    flow[..., 3] = rng.integers(-1, 3, (8, 16)).astype(np.float32)
    compressed = zlib.compress(encode_matrix_float(flow, flow.shape))

    top = SimpleNamespace(
        name=1,
        ri_return1=SimpleNamespace(range_image_flow_compressed=compressed),
    )
    side = SimpleNamespace(
        name=2,
        ri_return1=SimpleNamespace(range_image_flow_compressed=b""),
    )
    frame = SimpleNamespace(lasers=[top, side])

    flows = parse_flow_range_images(frame)
    assert set(flows) == {1}  # laser without flow channels is skipped
    np.testing.assert_allclose(flows[1], flow)
    assert flows[1].shape == (8, 16, 4)


def test_flow_required_raises_on_flowless_record():
    """A record with no flow channels must fail loudly (unless opted out),
    never silently write zero flows again."""
    from emernerf_tpu.tools.preprocess import WaymoProcessor

    proc = WaymoProcessor("/nonexistent", "/nonexistent", [], [],
                          require_flow=True)
    frame = SimpleNamespace(
        lasers=[
            SimpleNamespace(
                name=1,
                ri_return1=SimpleNamespace(range_image_flow_compressed=b""),
            )
        ],
        pose=SimpleNamespace(transform=list(np.eye(4).reshape(-1))),
    )

    class _StubFrameUtils:
        @staticmethod
        def parse_range_image_and_camera_projection(frame):
            return {}, {}, None, None

    with pytest.raises(RuntimeError, match="scene-flow"):
        proc._save_lidar(frame, "/tmp", 0, _StubFrameUtils)
