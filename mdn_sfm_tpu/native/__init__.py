"""Native C++ components, loaded via ctypes.

Replaces the reference's third-party native machinery (SURVEY.md §2):
pycocotools' C RLE codec and cv2's contour→bbox path. The shared library is
built on demand with g++ (no pip/pybind11 dependency) and cached next to the
source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "librle.so")
_SRC = os.path.join(_HERE, "rle.cpp")
_LOCK = threading.Lock()
_LIB = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
        check=True,
        capture_output=True,
    )


def lib() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        L = ctypes.CDLL(_SO)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        L.rle_encode.restype = ctypes.c_int64
        L.rle_encode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, u32p]
        L.rle_decode.restype = None
        L.rle_decode.argtypes = [u32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, u8p]
        L.rle_to_string.restype = ctypes.c_int64
        L.rle_to_string.argtypes = [u32p, ctypes.c_int64, ctypes.c_char_p]
        L.rle_from_string.restype = ctypes.c_int64
        L.rle_from_string.argtypes = [ctypes.c_char_p, ctypes.c_int64, u32p]
        L.mask_bbox.restype = None
        L.mask_bbox.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, i32p]
        L.mask_union.restype = None
        L.mask_union.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, u8p]
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        L.nms.restype = ctypes.c_int64
        L.nms.argtypes = [f32p, i64p, ctypes.c_int64, ctypes.c_float, ctypes.c_int64, i64p]
        _LIB = L
        return L


def _u8(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def rle_encode(mask: np.ndarray) -> dict:
    """Encode a binary (H, W) mask to a COCO-format RLE dict
    {'size': [H, W], 'counts': bytes} — the pycocotools-compatible surface
    (reference call: pycocotools.mask.encode(np.asarray(roi, order='F')),
    datasets/kitti_dataset.py:196)."""
    mask = np.asarray(mask)
    h, w = mask.shape
    # column-major flattening: index = x*h + y
    fmask = np.ascontiguousarray((mask != 0).astype(np.uint8).T.reshape(-1))
    counts = np.empty(h * w + 1, np.uint32)
    L = lib()
    m = L.rle_encode(_u8(fmask), h, w, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    out = ctypes.create_string_buffer(int(8 * m))
    n = L.rle_to_string(counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), m, out)
    return {"size": [int(h), int(w)], "counts": out.raw[:n]}


def rle_decode(rle: dict) -> np.ndarray:
    """Decode a COCO-format RLE dict back to a binary (H, W) uint8 mask."""
    h, w = rle["size"]
    s = rle["counts"]
    if isinstance(s, str):
        s = s.encode()
    counts = np.empty(len(s) + 1, np.uint32)
    L = lib()
    m = L.rle_from_string(s, len(s), counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    flat = np.empty(h * w, np.uint8)
    L.rle_decode(counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), m, h, w, _u8(flat))
    return flat.reshape(w, h).T.copy()  # undo column-major


def mask_bbox(mask: np.ndarray) -> list[int] | None:
    """[xmin, ymin, xmax, ymax] of nonzero pixels (exclusive max, matching
    the reference's contour-union convention); None if empty."""
    mask = np.ascontiguousarray((np.asarray(mask) != 0).astype(np.uint8))
    h, w = mask.shape
    bbox = np.empty(4, np.int32)
    lib().mask_bbox(_u8(mask), h, w, bbox.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if bbox[2] < 0:
        return None
    return [int(v) for v in bbox]


def nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float, max_keep: int = -1) -> np.ndarray:
    """Greedy IoU NMS (host path): returns kept indices sorted by score.

    Args:
        boxes: (N, 4) XYXY float32.
        scores: (N,) float32.
    """
    import ctypes as ct

    boxes = np.ascontiguousarray(boxes, np.float32)
    n = boxes.shape[0]
    if n == 0:
        return np.zeros((0,), np.int64)
    order = np.ascontiguousarray(np.argsort(-np.asarray(scores)), np.int64)
    if max_keep < 0:
        max_keep = n
    keep = np.empty(n, np.int64)
    kept = lib().nms(
        boxes.ctypes.data_as(ct.POINTER(ct.c_float)),
        order.ctypes.data_as(ct.POINTER(ct.c_int64)),
        n,
        float(iou_threshold),
        max_keep,
        keep.ctypes.data_as(ct.POINTER(ct.c_int64)),
    )
    return keep[:kept].copy()


def mask_union(masks: np.ndarray) -> np.ndarray:
    """Union (N, H, W) binary masks → (H, W) uint8
    (reference: loss_utils.py:110-124 / generate_mobile_gt_d2.py:177-187)."""
    masks = np.ascontiguousarray((np.asarray(masks) != 0).astype(np.uint8))
    n, h, w = masks.shape
    out = np.empty(h * w, np.uint8)
    lib().mask_union(_u8(masks.reshape(-1)), n, h * w, _u8(out))
    return out.reshape(h, w)
