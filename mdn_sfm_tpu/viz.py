"""Visualization / IO utilities (reference: utils.py:100-332).

Middlebury flow colorization, KITTI flow-error maps, KITTI 16-bit flow PNG
reading (pypng is not available here; we decode with PIL/imageio), image
normalization. Vectorized numpy — no per-pixel python loops.
"""

from __future__ import annotations

import numpy as np

UNKNOWN_FLOW_THRESH = 1e7

# KITTI flow-error color LUT (reference: utils.py:20-29)
_LC = np.array(
    [
        [0, 0.0625, 49, 54, 149],
        [0.0625, 0.125, 69, 117, 180],
        [0.125, 0.25, 116, 173, 209],
        [0.25, 0.5, 171, 217, 233],
        [0.5, 1, 224, 243, 248],
        [1, 2, 254, 224, 144],
        [2, 4, 253, 174, 97],
        [4, 8, 244, 109, 67],
        [8, 16, 215, 48, 39],
        [16, 1e9, 165, 0, 38],
    ]
)


def normalize_image(x: np.ndarray) -> np.ndarray:
    """Rescale to [0, 1] (reference: utils.py:326-332)."""
    x = np.asarray(x, dtype=np.float32)
    ma, mi = float(x.max()), float(x.min())
    d = ma - mi if ma != mi else 1e-5
    return (x - mi) / d


def sec_to_hm_str(t: float) -> str:
    """10239 → '02h50m39s' (reference: utils.py:335-352)."""
    t = int(t)
    s = t % 60
    t //= 60
    m = t % 60
    t //= 60
    return f"{t:02d}h{m:02d}m{s:02d}s"


def make_color_wheel() -> np.ndarray:
    """Middlebury color wheel (reference: utils.py:224-269)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel


_WHEEL = make_color_wheel()


def compute_color(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Flow → color code, vectorized (reference: utils.py:180-221)."""
    nan_idx = np.isnan(u) | np.isnan(v)
    u = np.where(nan_idx, 0, u)
    v = np.where(nan_idx, 0, v)

    ncols = _WHEEL.shape[0]
    rad = np.sqrt(u**2 + v**2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1) + 1
    k0 = np.floor(fk).astype(int)
    k1 = k0 + 1
    k1[k1 == ncols + 1] = 1
    f = fk - k0

    img = np.zeros(u.shape + (3,))
    for i in range(3):
        col0 = _WHEEL[k0 - 1, i] / 255
        col1 = _WHEEL[k1 - 1, i] / 255
        col = (1 - f) * col0 + f * col1
        inside = rad <= 1
        col = np.where(inside, 1 - rad * (1 - col), col * 0.75)
        img[..., i] = np.floor(255 * col * (1 - nan_idx))
    return img


def flow_to_image(flow: np.ndarray, max_rad: float | None = None) -> np.ndarray:
    """Flow map (H, W, ≥2) → middlebury color image uint8
    (reference: utils.py:128-157)."""
    u = flow[..., 0].astype(np.float64).copy()
    v = flow[..., 1].astype(np.float64).copy()
    unknown = (np.abs(u) > UNKNOWN_FLOW_THRESH) | (np.abs(v) > UNKNOWN_FLOW_THRESH)
    u[unknown] = 0
    v[unknown] = 0
    if max_rad is None:
        rad = np.sqrt(u**2 + v**2)
        max_rad = max(-1, float(rad.max()))
    u = u / (max_rad + np.finfo(float).eps)
    v = v / (max_rad + np.finfo(float).eps)
    img = compute_color(u, v)
    img[unknown] = 0
    return np.uint8(img)


def get_flow_error_image(
    gt_flow_occ: np.ndarray,
    valid_flow_occ: np.ndarray,
    valid_flow_noc: np.ndarray,
    flow: np.ndarray,
) -> np.ndarray:
    """KITTI flow-error heatmap (reference: utils.py:160-177)."""
    h, w = flow.shape[:2]
    out = np.zeros((h, w, 3))
    df = gt_flow_occ[..., :2] - flow[..., :2]
    f_err = np.sqrt((df**2).sum(-1))
    f_mag = np.sqrt((gt_flow_occ[..., :2] ** 2).sum(-1)) + 1e-6
    n_err = np.minimum(f_err / 3.0, 20.0 * f_err / f_mag)
    for lo, hi, r, g, b in _LC:
        cond = (lo <= n_err) & (n_err < hi)
        out[cond] = (r, g, b)
    out[~valid_flow_noc.astype(bool)] *= 0.5
    out[~valid_flow_occ.astype(bool)] = 0
    return out


def flow_read_png(fpath: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read KITTI 16-bit optical-flow PNG → (u, v, valid)
    (reference: utils.py:272-286; decoded without pypng — PIL cannot read
    16-bit RGB PNGs, so we use cv2, converting its BGR channel order back)."""
    import cv2

    I = cv2.imread(fpath, cv2.IMREAD_UNCHANGED)  # (H, W, 3) uint16, BGR
    if I is None:
        raise FileNotFoundError(fpath)
    I = I[:, :, ::-1].astype(np.int64)  # → RGB
    u = (I[:, :, 0].astype("float64") - 2**15) / 64.0
    v = (I[:, :, 1].astype("float64") - 2**15) / 64.0
    valid = I[:, :, 2]
    return u, v, valid


def load_as_float(path: str) -> np.ndarray:
    """imread → float32 (reference: utils.py:77-78)."""
    from imageio.v2 import imread

    return np.asarray(imread(path)).astype(np.float32)


def imwrite(path: str, img: np.ndarray) -> None:
    from imageio.v2 import imwrite as _imwrite

    _imwrite(path, img)


def draw_boxes_rgb(
    image_u8: np.ndarray,
    boxes_xyxy: np.ndarray,
    colors: list[tuple[int, int, int]] | None = None,
    width: int = 2,
) -> np.ndarray:
    """Draw bounding boxes on an (H, W, 3) uint8 image — torch-free analog of
    torchvision draw_bounding_boxes (reference: utils.py:32-50)."""
    img = image_u8.copy()
    h, w = img.shape[:2]
    for n, box in enumerate(np.asarray(boxes_xyxy, dtype=int)):
        x1, y1, x2, y2 = [int(c) for c in box]
        x1, x2 = np.clip([x1, x2], 0, w - 1)
        y1, y2 = np.clip([y1, y2], 0, h - 1)
        color = colors[n] if colors else (255, 0, 0)
        for t in range(width):
            xa, xb = np.clip([x1 + t, x2 - t], 0, w - 1)
            ya, yb = np.clip([y1 + t, y2 - t], 0, h - 1)
            img[ya, xa : xb + 1] = color
            img[yb, xa : xb + 1] = color
            img[ya : yb + 1, xa] = color
            img[ya : yb + 1, xb] = color
    return img


def write_result(f, errs, err_names) -> None:
    """(reference: utils.py:106-120)"""
    for err, name in zip(errs, err_names):
        f.writelines(f"{name}: \t {err:.3f} \n")
