"""ctypes bindings for the native image library (JPEG decode + warp).

Counterpart of the reference's host data path — ``cv2.imread`` +
``cv2.warpAffine`` inside DataLoader worker processes
(``lib/dataset/JointsDataset.py:120-172``) — as a dependency-free C++
library (``fhpe_tpu/ops/cpp/imagedec.cpp``, built by the same Makefile as
the NMS ops).  Both functions are bit-identical to their cv2 equivalents
(pinned by tests/test_native_image.py):

* ``imread_native``: libjpeg-turbo decode with OpenCV's settings (islow
  DCT, fancy upsampling), BGR or RGB order.
* ``warp_affine_native``: OpenCV's warpAffine INTER_LINEAR +
  BORDER_CONSTANT(0) fixed-point algorithm, with an extra ``flip_src``
  mode that reads the source mirrored — bit-equal to warping a
  materialized ``img[:, ::-1]`` (the reference's horizontal flip) without
  the full-image copy.

ctypes releases the GIL for the duration of each call, so the loader's
thread pool decodes/warps in parallel, same as with cv2.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_SO_PATH = os.path.join(_CPP_DIR, "libfhpe_image.so")
_lib: Optional[ctypes.CDLL] = None
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _CPP_DIR, "libfhpe_image.so"],
                       check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.fhpe_jpeg_dims.restype = ctypes.c_int
    lib.fhpe_jpeg_dims.argtypes = [
        _u8p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.fhpe_jpeg_decode.restype = ctypes.c_int
    lib.fhpe_jpeg_decode.argtypes = [
        _u8p, ctypes.c_int64, _u8p, ctypes.c_int64, ctypes.c_int]
    lib.fhpe_warp_affine_u8.restype = None
    lib.fhpe_warp_affine_u8.argtypes = [
        _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _u8p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}  # SOF0-15 minus DHT/JPG/DAC


def _jpeg_dims_fast(buf: bytes) -> Optional[Tuple[int, int]]:
    """(height, width) from the SOF marker, scanning segment lengths.

    Pure-Python so the C decoder does not have to parse the header twice
    (jpeg_read_header also builds quant/huffman state — measurable per
    sample on the hot loader path).  Returns None on anything unusual;
    the caller then falls back to the C header parse."""
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        return None
    i = 2
    n = len(buf)
    while i + 3 < n:
        if buf[i] != 0xFF:
            return None
        marker = buf[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if 0xD0 <= marker <= 0xD9 or marker == 0x01:  # RST/SOI/EOI/TEM
            i += 2
            continue
        seg_len = (buf[i + 2] << 8) | buf[i + 3]
        if seg_len < 2:
            return None
        if marker in _SOF_MARKERS:
            if i + 9 >= n:
                return None
            h = (buf[i + 5] << 8) | buf[i + 6]
            w = (buf[i + 7] << 8) | buf[i + 8]
            return (h, w) if h > 0 and w > 0 else None
        i += 2 + seg_len
    return None


def decode_jpeg_bytes(buf: bytes, bgr: bool = True) -> Optional[np.ndarray]:
    """Decode a JPEG byte string to (H, W, 3) uint8; None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(buf, dtype=np.uint8)
    dims = _jpeg_dims_fast(buf)
    if dims is None:
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        if lib.fhpe_jpeg_dims(src.ctypes.data_as(_u8p), src.size,
                              ctypes.byref(w), ctypes.byref(h),
                              ctypes.byref(c)):
            return None
        dims = (h.value, w.value)
    out = np.empty((dims[0], dims[1], 3), dtype=np.uint8)
    rc = lib.fhpe_jpeg_decode(src.ctypes.data_as(_u8p), src.size,
                              out.ctypes.data_as(_u8p), out.nbytes,
                              1 if bgr else 0)
    return out if rc == 0 else None


def imread_native(path: str, bgr: bool = True) -> Optional[np.ndarray]:
    """cv2.imread(path, IMREAD_COLOR | IMREAD_IGNORE_ORIENTATION)
    equivalent for JPEG files (bit-identical); None on failure (caller
    falls back to cv2)."""
    if not path.lower().endswith((".jpg", ".jpeg")):
        return None
    try:
        with open(path, "rb") as f:
            buf = f.read()
    except OSError:
        return None
    return decode_jpeg_bytes(buf, bgr=bgr)


def warp_affine_native(img: np.ndarray, M: np.ndarray,
                       dsize: Tuple[int, int],
                       flip_src: bool = False) -> Optional[np.ndarray]:
    """cv2.warpAffine(img, M, dsize, flags=INTER_LINEAR) — bit exact.

    ``dsize`` is (width, height), cv2 convention.  ``flip_src`` warps as
    if ``img[:, ::-1]`` had been passed, without materializing the flip.
    Returns None when the library is unavailable (caller falls back).
    """
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, ch = img.shape
    dw, dh = int(dsize[0]), int(dsize[1])
    m = np.ascontiguousarray(M, dtype=np.float64)
    out = np.empty((dh, dw, ch), dtype=np.uint8)
    lib.fhpe_warp_affine_u8(
        img.ctypes.data_as(_u8p), h, w, ch,
        out.ctypes.data_as(_u8p), dh, dw,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), 0,
        1 if flip_src else 0)
    return out[:, :, 0] if squeeze else out
