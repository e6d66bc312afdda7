"""Native (C++) data-plane core, loaded via ctypes.

The reference preprocessor leans on TensorFlow's C++ kernels for TFRecord
framing and protobuf decode; this package is the repo's own native
equivalent (wirecodec.cc).  The library is built on first import with the
host toolchain (g++, baked into the image) and cached next to the source;
every entry point degrades to the pure-Python implementation in
``emernerf_tpu/tools/waymo_wire.py`` when a compiler is unavailable, so
the native layer is an accelerator, never a hard dependency.

Public surface (all return None/raise cleanly when unavailable):

    available() -> bool
    crc32c(data: bytes) -> int
    masked_crc(data: bytes) -> int
    tfrecord_index(buf) -> (offsets, lengths) uint64 arrays
    scan_fields(buf) -> (field_num, wire_type, off, len, value) arrays
    decode_varints(buf) -> uint64 array
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "wirecodec.cc")
_LIB_NAME = "libwirecodec.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build(out_path: str) -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", out_path,
    ]
    try:
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=120
        )
    except (OSError, subprocess.TimeoutExpired):
        return False
    if r.returncode != 0:
        sys.stderr.write(
            f"emernerf_tpu.native: build failed, using pure-Python codec\n"
            f"{r.stderr[-2000:]}\n"
        )
        return False
    return True


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.en_crc32c.restype = ctypes.c_uint32
    lib.en_crc32c.argtypes = [u8p, ctypes.c_size_t]
    lib.en_masked_crc.restype = ctypes.c_uint32
    lib.en_masked_crc.argtypes = [u8p, ctypes.c_size_t]
    lib.en_tfrecord_index.restype = ctypes.c_int64
    lib.en_tfrecord_index.argtypes = [
        u8p, ctypes.c_uint64, u64p, u64p, ctypes.c_int64, ctypes.c_int,
    ]
    lib.en_scan_fields.restype = ctypes.c_int64
    lib.en_scan_fields.argtypes = [
        u8p, ctypes.c_uint64, u32p, u8p, u64p, u64p, u64p, ctypes.c_int64,
    ]
    lib.en_decode_varints.restype = ctypes.c_int64
    lib.en_decode_varints.argtypes = [
        u8p, ctypes.c_uint64, u64p, ctypes.c_int64,
    ]
    return lib


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("EMERNERF_NO_NATIVE"):
            return None
        # prefer a lib next to the source (rebuilt when the source is newer)
        cand = os.path.join(_DIR, _LIB_NAME)
        fresh = (
            os.path.exists(cand)
            and os.path.getmtime(cand) >= os.path.getmtime(_SRC)
        )
        if not fresh:
            # build into a temp file then atomically move into place; fall
            # back to a per-user temp dir when the package dir is read-only
            for target_dir in (_DIR, tempfile.gettempdir()):
                target = os.path.join(target_dir, _LIB_NAME)
                try:
                    fd, tmp = tempfile.mkstemp(
                        suffix=".so", dir=target_dir
                    )
                    os.close(fd)
                except OSError:
                    continue
                ok = _build(tmp)
                if ok:
                    try:
                        os.replace(tmp, target)
                        cand = target
                        break
                    except OSError:
                        cand = tmp
                        break
                if os.path.exists(tmp):
                    os.unlink(tmp)
            else:
                return None
        if not os.path.exists(cand):
            return None
        try:
            _lib = _bind(ctypes.CDLL(cand))
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _as_u8(buf) -> Tuple[ctypes.POINTER(ctypes.c_uint8), int]:
    arr = np.frombuffer(buf, dtype=np.uint8)
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), arr.size


def crc32c(data) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native wirecodec unavailable")
    p, n = _as_u8(data)
    return int(lib.en_crc32c(p, n))


def masked_crc(data) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native wirecodec unavailable")
    p, n = _as_u8(data)
    return int(lib.en_masked_crc(p, n))


def tfrecord_index(buf, verify: int = 2):
    """Index all records of an in-memory TFRecord file image.

    Returns (offsets, lengths) uint64 arrays over ``buf``.  ``verify``:
    0 skip CRC checks, 1 check length CRCs, 2 check both (default —
    matches the pure-Python reader's behavior)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native wirecodec unavailable")
    p, n = _as_u8(buf)
    # worst-case record size 16 bytes (empty payload)
    cap = max(n // 16 + 1, 1)
    offsets = np.empty(cap, np.uint64)
    lengths = np.empty(cap, np.uint64)
    rc = lib.en_tfrecord_index(
        p, n,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        cap, verify,
    )
    # the ctypes pointer pins a buffer export on ``buf`` (data_as keeps a
    # reference); drop it BEFORE raising so a traceback-held frame can't
    # block an mmap close upstream
    del p
    if rc < 0:
        raise ValueError(
            {-1: "truncated TFRecord", -2: "corrupt TFRecord length CRC",
             -3: "corrupt TFRecord data CRC", -4: "index overflow"}[rc]
        )
    return offsets[:rc], lengths[:rc]


def scan_fields(buf):
    """One-level protobuf field scan.

    Returns (field_num u32, wire_type u8, off u64, len u64, value u64)
    arrays — one entry per top-level field occurrence in ``buf``."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native wirecodec unavailable")
    p, n = _as_u8(buf)
    # adaptive capacity: messages with huge length-delimited payloads
    # (camera blobs, compressed range images) have FEW top-level fields,
    # so start small and double on overflow (-4) up to the n/2 bound
    cap = min(max(int(n) // 2 + 2, 4), 4096)
    while True:
        fnum = np.empty(cap, np.uint32)
        wtyp = np.empty(cap, np.uint8)
        off = np.empty(cap, np.uint64)
        ln = np.empty(cap, np.uint64)
        val = np.empty(cap, np.uint64)
        rc = lib.en_scan_fields(
            p, n,
            fnum.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            wtyp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            off.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            ln.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            val.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            cap,
        )
        if rc != -4:
            break
        cap = min(cap * 8, int(n) // 2 + 2)
    del p
    if rc < 0:
        raise ValueError(f"malformed protobuf message (code {rc})")
    return fnum[:rc], wtyp[:rc], off[:rc], ln[:rc], val[:rc]


def decode_varints(buf):
    """Decode a packed-varint payload to a uint64 array."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native wirecodec unavailable")
    p, n = _as_u8(buf)
    cap = max(int(n), 1)
    out = np.empty(cap, np.uint64)
    rc = lib.en_decode_varints(
        p, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), cap
    )
    del p
    if rc < 0:
        raise ValueError(f"malformed packed varints (code {rc})")
    return out[:rc]
