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


def _build(src: str, so: str, extra: list[str] | None = None) -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so]
        + (extra or []),
        check=True,
        capture_output=True,
    )


def _ensure_built(src: str, so: str, extra: list[str] | None = None) -> None:
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        _build(src, so, extra)


def lib() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        _ensure_built(_SRC, _SO)
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


# --------------------------------------------------------------- image IO
# Fused PNG/JPEG decode + bilinear resize (imgio.cpp) — the native
# replacement for the reference's PIL-decode + cv2-resize host path
# (mono_dataset.py:14-19, :103). Linked against the system libjpeg/libpng;
# gated: imgio_available() is False (and callers fall back to PIL/cv2) when
# the codec libraries are missing.

_IMGIO_SO = os.path.join(_HERE, "libimgio.so")
_IMGIO_SRC = os.path.join(_HERE, "imgio.cpp")
_IMGIO_LOCK = threading.Lock()
_IMGIO: "ctypes.CDLL | None | bool" = None  # None=untried, False=unavailable


def _imgio() -> "ctypes.CDLL | bool":
    global _IMGIO
    with _IMGIO_LOCK:
        if _IMGIO is not None:
            return _IMGIO
        try:
            _ensure_built(_IMGIO_SRC, _IMGIO_SO, ["-ljpeg", "-lpng"])
            L = ctypes.CDLL(_IMGIO_SO)
        except (OSError, subprocess.CalledProcessError):
            _IMGIO = False
            return False
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        L.img_decode_resize.restype = ctypes.c_int32
        L.img_decode_resize.argtypes = [
            ctypes.c_char_p, u8p, ctypes.c_int64, ctypes.c_int64, i32p, i32p,
        ]
        L.img_decode_resize_batch.restype = ctypes.c_int32
        L.img_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, u8p,
            ctypes.c_int64, ctypes.c_int64, i32p, ctypes.c_int64, i32p,
        ]
        L.img_resize_bilinear.restype = None
        L.img_resize_bilinear.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, u8p, ctypes.c_int64, ctypes.c_int64,
        ]
        _IMGIO = L
        return L


def imgio_available() -> bool:
    """True if the native decode library built and loaded."""
    return _imgio() is not False


def decode_resize(path: str, height: int, width: int) -> tuple[np.ndarray, tuple[int, int]]:
    """Decode a PNG/JPEG and bilinear-resize to (height, width) RGB u8.

    Returns (image (H, W, 3) u8, (src_w, src_h)). Raises FileNotFoundError /
    ValueError on unreadable or non-PNG/JPEG input.
    """
    L = _imgio()
    assert L is not False, "native imgio unavailable; check imgio_available()"
    out = np.empty((height, width, 3), np.uint8)
    sw = ctypes.c_int32(0)
    sh = ctypes.c_int32(0)
    rc = L.img_decode_resize(
        path.encode(), _u8(out), height, width, ctypes.byref(sw), ctypes.byref(sh)
    )
    if rc == 1:
        raise FileNotFoundError(path)
    if rc != 0:
        raise ValueError(f"decode failed for {path} (code {rc})")
    return out, (int(sw.value), int(sh.value))


def decode_resize_batch(
    paths: list[str], height: int, width: int, n_threads: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Threaded batch decode+resize → ((N, H, W, 3) u8, (N, 2) src (w, h)).

    Raises on the first failed file (all-or-nothing, like a loader worker).
    """
    L = _imgio()
    assert L is not False, "native imgio unavailable; check imgio_available()"
    n = len(paths)
    out = np.empty((n, height, width, 3), np.uint8)
    dims = np.zeros((n, 2), np.int32)
    errs = np.zeros(n, np.int32)
    cpaths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fails = L.img_decode_resize_batch(
        cpaths, n, _u8(out.reshape(-1)), height, width,
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads,
        errs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if fails:
        bad = int(np.flatnonzero(errs)[0])
        if errs[bad] == 1:
            raise FileNotFoundError(paths[bad])
        raise ValueError(f"decode failed for {paths[bad]} (code {int(errs[bad])})")
    return out, dims


def resize_bilinear_u8(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Native separable bilinear resize of an (H, W, 3) u8 image."""
    L = _imgio()
    assert L is not False, "native imgio unavailable; check imgio_available()"
    img = np.ascontiguousarray(img, np.uint8)
    sh, sw = img.shape[:2]
    out = np.empty((height, width, 3), np.uint8)
    L.img_resize_bilinear(_u8(img.reshape(-1)), sh, sw, _u8(out.reshape(-1)), height, width)
    return out


def mask_union(masks: np.ndarray) -> np.ndarray:
    """Union (N, H, W) binary masks → (H, W) uint8
    (reference: loss_utils.py:110-124 / generate_mobile_gt_d2.py:177-187)."""
    masks = np.ascontiguousarray((np.asarray(masks) != 0).astype(np.uint8))
    n, h, w = masks.shape
    out = np.empty(h * w, np.uint8)
    lib().mask_union(_u8(masks.reshape(-1)), n, h * w, _u8(out))
    return out.reshape(h, w)
