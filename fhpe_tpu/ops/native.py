"""ctypes bindings for the native C++ NMS library.

Counterpart of the reference's compiled extensions (``lib/nms/cpu_nms.pyx``
via ``lib/Makefile``): ``make -C fhpe_tpu/ops/cpp`` builds
``libfhpe_nms.so``; this module loads it lazily, auto-building on first use
when a compiler is available, and exposes drop-in variants of
``ops.nms.nms`` / ``ops.nms.oks_nms`` with identical keep-lists (pinned by
tests/test_native_nms.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from .nms import COCO_SIGMAS

_CPP_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_SO_PATH = os.path.join(_CPP_DIR, "libfhpe_nms.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _CPP_DIR], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.fhpe_box_nms.restype = ctypes.c_int64
    lib.fhpe_box_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64)]
    lib.fhpe_oks_nms.restype = ctypes.c_int64
    lib.fhpe_oks_nms.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64)]
    lib.fhpe_soft_oks_nms.restype = ctypes.c_int64
    lib.fhpe_soft_oks_nms.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def box_nms_native(dets: np.ndarray, thresh: float):
    """C++ greedy box NMS; keep-list identical to ops.nms.nms."""
    lib = get_lib()
    if lib is None:
        from .nms import nms
        return nms(dets, thresh)
    dets = np.ascontiguousarray(dets, dtype=np.float32)
    n = dets.shape[0]
    if n == 0:
        return []
    keep = np.zeros(n, dtype=np.int64)
    kept = lib.fhpe_box_nms(
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return keep[:kept].tolist()


def _pack_kpts_db(kpts_db, sigmas):
    sigmas = COCO_SIGMAS if sigmas is None else np.asarray(sigmas)
    j = len(sigmas)
    kpts = np.ascontiguousarray(
        [np.asarray(k["keypoints"], dtype=np.float64).flatten()[:3 * j]
         for k in kpts_db], dtype=np.float64)
    scores = np.ascontiguousarray([k["score"] for k in kpts_db], np.float64)
    areas = np.ascontiguousarray([k["area"] for k in kpts_db], np.float64)
    sig = np.ascontiguousarray(sigmas, np.float64)
    return kpts, scores, areas, sig, j


def oks_nms_native(kpts_db, thresh: float, sigmas=None):
    """C++ greedy OKS NMS; keep-list identical to ops.nms.oks_nms."""
    lib = get_lib()
    if lib is None:
        from .nms import oks_nms
        return oks_nms(kpts_db, thresh, sigmas)
    n = len(kpts_db)
    if n == 0:
        return []
    kpts, scores, areas, sig, j = _pack_kpts_db(kpts_db, sigmas)
    keep = np.zeros(n, dtype=np.int64)
    kept = lib.fhpe_oks_nms(
        kpts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        areas.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, j,
        sig.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return keep[:kept].tolist()


def soft_oks_nms_native(kpts_db, thresh: float, sigmas=None,
                        max_dets: int = 20):
    """C++ soft OKS NMS; keep-list identical to ops.nms.soft_oks_nms."""
    lib = get_lib()
    if lib is None:
        from .nms import soft_oks_nms
        return soft_oks_nms(kpts_db, thresh, sigmas, max_dets=max_dets)
    n = len(kpts_db)
    if n == 0:
        return []
    kpts, scores, areas, sig, j = _pack_kpts_db(kpts_db, sigmas)
    keep = np.zeros(max(n, max_dets), dtype=np.int64)
    kept = lib.fhpe_soft_oks_nms(
        kpts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        areas.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, j,
        sig.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(thresh), ctypes.c_int64(max_dets),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return keep[:kept].tolist()
