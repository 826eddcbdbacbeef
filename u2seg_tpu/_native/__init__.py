"""ctypes bindings for the native RLE / COCO-matching kernels.

Builds ``rle_ops.cpp`` on first use (g++ -O3 -shared) into the package dir;
falls back to the pure-numpy implementations in ``evaluation.rle`` when no
compiler is available. Public surface mirrors the numpy module so callers
can do ``from u2seg_tpu._native import native`` and duck-type.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "rle_ops.cpp")
_LIB_PATH = os.path.join(_HERE, "librle_ops.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception as e:  # pragma: no cover - depends on toolchain
        logger.warning("native build failed (%s); using numpy fallback", e)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        path = _LIB_PATH
        if not os.path.exists(path) or (
            os.path.getmtime(path) < os.path.getmtime(_SRC)
        ):
            path = _build()
        if path is None:
            _BUILD_FAILED = True
            return None
        lib = ctypes.CDLL(path)
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
        lib.rle_decode.argtypes = [u32p, ctypes.c_int, u8p, ctypes.c_int64]
        lib.rle_encode.argtypes = [u8p, ctypes.c_int64, u32p]
        lib.rle_encode.restype = ctypes.c_int
        lib.rle_area.argtypes = [u32p, ctypes.c_int]
        lib.rle_area.restype = ctypes.c_double
        lib.rle_iou_matrix.argtypes = [
            u32p, i64p, ctypes.c_int, u32p, i64p, ctypes.c_int, u8p, f64p,
        ]
        lib.rle_merge.argtypes = [
            u32p, i64p, ctypes.c_int, ctypes.c_int64, ctypes.c_int, u8p,
        ]
        lib.bbox_iou_matrix.argtypes = [
            f64p, ctypes.c_int, f64p, ctypes.c_int, u8p, f64p,
        ]
        lib.cocoeval_match.argtypes = [
            f64p, ctypes.c_int, ctypes.c_int, u8p, u8p, f64p, ctypes.c_int,
            u8p, i64p, i64p, u8p,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# numpy-friendly wrappers (same semantics as evaluation.rle)
# ---------------------------------------------------------------------------

def _counts_array(rle: dict) -> np.ndarray:
    from u2seg_tpu.evaluation import rle as rle_codec

    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = rle_codec.string_to_counts(counts)
    return np.asarray(counts, dtype=np.uint32)


def _concat(rles: Sequence[dict]):
    arrs = [_counts_array(r) for r in rles]
    off = np.zeros(len(arrs) + 1, np.int64)
    for i, a in enumerate(arrs):
        off[i + 1] = off[i] + len(a)
    flat = (
        np.concatenate(arrs).astype(np.uint32)
        if arrs else np.zeros(0, np.uint32)
    )
    return np.ascontiguousarray(flat), off


def decode(rle: dict) -> np.ndarray:
    lib = get_lib()
    h, w = rle["size"]
    counts = _counts_array(rle)
    out = np.empty(h * w, np.uint8)
    lib.rle_decode(counts, len(counts), out, h * w)
    return out.reshape((w, h)).T


def encode(mask: np.ndarray) -> dict:
    from u2seg_tpu.evaluation import rle as rle_codec

    lib = get_lib()
    h, w = mask.shape
    flat = np.ascontiguousarray(
        np.asfortranarray(mask).ravel(order="F").astype(np.uint8)
    )
    counts = np.empty(h * w + 1, np.uint32)
    m = lib.rle_encode(flat, h * w, counts)
    return {
        "size": [h, w],
        "counts": rle_codec.counts_to_string(counts[:m].tolist()),
    }


def area(rle: dict) -> int:
    lib = get_lib()
    counts = _counts_array(rle)
    return int(lib.rle_area(counts, len(counts)))


def iou(dt: Sequence[dict], gt: Sequence[dict], iscrowd: Sequence[int]) -> np.ndarray:
    lib = get_lib()
    d, g = len(dt), len(gt)
    if d == 0 or g == 0:
        return np.zeros((d, g))
    dt_flat, dt_off = _concat(dt)
    gt_flat, gt_off = _concat(gt)
    crowd = np.asarray(iscrowd, np.uint8)
    out = np.zeros((d, g), np.float64)
    lib.rle_iou_matrix(dt_flat, dt_off, d, gt_flat, gt_off, g, crowd, out)
    return out


def merge(rles: Sequence[dict], intersect: bool = False) -> dict:
    lib = get_lib()
    if not rles:
        return {"size": [0, 0], "counts": b""}
    h, w = rles[0]["size"]
    flat, off = _concat(rles)
    out = np.empty(h * w, np.uint8)
    lib.rle_merge(flat, off, len(rles), h * w, int(intersect), out)
    return encode(out.reshape((w, h)).T)


def bbox_iou(dt_xywh: np.ndarray, gt_xywh: np.ndarray,
             iscrowd: Sequence[int]) -> np.ndarray:
    lib = get_lib()
    d, g = len(dt_xywh), len(gt_xywh)
    if d == 0 or g == 0:
        return np.zeros((d, g))
    out = np.zeros((d, g), np.float64)
    lib.bbox_iou_matrix(
        np.ascontiguousarray(dt_xywh, np.float64), d,
        np.ascontiguousarray(gt_xywh, np.float64), g,
        np.asarray(iscrowd, np.uint8), out,
    )
    return out


def cocoeval_match(ious: np.ndarray, gt_ignore: np.ndarray,
                   iscrowd: np.ndarray, iou_thrs: np.ndarray,
                   dt_out_of_area: np.ndarray):
    """Returns (dtm, gtm, dt_ignore) with dtm/gtm holding 1-based indices
    (0 = unmatched), matching coco_eval_core.evaluateImg's inner loops."""
    lib = get_lib()
    d, g = ious.shape
    t = len(iou_thrs)
    dtm = np.zeros((t, d), np.int64)
    gtm = np.zeros((t, g), np.int64)
    dti = np.zeros((t, d), np.uint8)
    lib.cocoeval_match(
        np.ascontiguousarray(ious, np.float64), d, g,
        np.asarray(gt_ignore, np.uint8), np.asarray(iscrowd, np.uint8),
        np.ascontiguousarray(iou_thrs, np.float64), t,
        np.asarray(dt_out_of_area, np.uint8), dtm, gtm, dti,
    )
    return dtm, gtm, dti
