"""Mask R-CNN R50-FPN inference in JAX — static-shape TPU replacement for the
reference's frozen detectron2 model (trainer.py:165-179, Cityscapes
``mask_rcnn_R_50_FPN`` config, custom 11-class KITTI weights).

Every dynamic structure in detectron2 (variable proposal/instance counts,
per-class NMS lists) becomes a fixed-size tensor with a validity mask — the
TPU-idiomatic shape fix (SURVEY.md §7 hard parts). The pipeline:

  BGR caffe-normalized image → ResNet-50 (stride_in_1x1, frozen BN) → FPN
  P2..P6 → RPN head → per-level top-k + joint NMS (fixed post_nms_topk) →
  ROIAlign 7×7 → box head (2×FC1024) → class-offset NMS (fixed max_det) →
  ROIAlign 14×14 on detections → mask head → 28×28 masks → paste.

Weight import from the reference's ``model_final_detectron2.pth`` is in
:func:`import_detectron2_pth`.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.resnet import Bottleneck, _bn, _conv

Array = jax.Array

# --- detectron2 Cityscapes mask_rcnn_R_50_FPN config + reference overrides
PIXEL_MEAN_BGR = (103.53, 116.28, 123.675)  # caffe2 means, std 1
MIN_SIZE_TEST = 1024          # trainer.py:174
MAX_SIZE_TEST = 2048          # Cityscapes config
ANCHOR_SIZES = (32, 64, 128, 256, 512)      # per FPN level P2..P6
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
RPN_PRE_NMS_TOPK = 1000       # per level, test
RPN_POST_NMS_TOPK = 1000
RPN_NMS_THRESH = 0.7
BOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
ROI_SCORE_THRESH = 0.3        # trainer.py:175
ROI_NMS_THRESH = 0.5
NUM_CLASSES = 11              # trainer.py:172
MASK_RES = 28


# ------------------------------------------------------------------ modules


class D2ResNet50(nn.Module):
    """detectron2-style ResNet-50 trunk → (C2, C3, C4, C5)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        x = _conv(64, 7, 2, self.dtype, "stem_conv1")(x)
        x = nn.relu(_bn("stem_bn1", self.dtype, train=False)(x))
        x = nn.max_pool(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf),
            (3, 3), strides=(2, 2), padding="VALID",
        )
        feats = []
        for stage, (width, n_blocks) in enumerate(zip((64, 128, 256, 512), (3, 4, 6, 3))):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    width, stride if b == 0 else 1, self.dtype, stride_in_1x1=True,
                    name=f"res{stage + 2}_{b}",
                )(x, train=False)
            feats.append(x)
        return feats  # C2..C5 at /4../32


class FPN(nn.Module):
    """Lateral 1×1 + top-down nearest + output 3×3 → P2..P6 (256ch)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, c_feats: list[Array]) -> list[Array]:
        conv = lambda k, name: nn.Conv(  # noqa: E731
            256, (k, k), padding="SAME", dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        laterals = [conv(1, f"fpn_lateral{i + 2}")(c) for i, c in enumerate(c_feats)]
        # top-down
        p = [None] * 4
        p[3] = laterals[3]
        for i in (2, 1, 0):
            up = jnp.repeat(jnp.repeat(p[i + 1], 2, axis=1), 2, axis=2)
            p[i] = laterals[i] + up[:, : laterals[i].shape[1], : laterals[i].shape[2]]
        outs = [conv(3, f"fpn_output{i + 2}")(pi) for i, pi in enumerate(p)]
        p6 = nn.max_pool(outs[3], (1, 1), strides=(2, 2), padding="VALID")
        return outs + [p6]  # P2..P6


class RPNHead(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: list[Array]) -> tuple[list[Array], list[Array]]:
        conv = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")
        obj = nn.Conv(len(ANCHOR_RATIOS), (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="objectness_logits")
        deltas = nn.Conv(4 * len(ANCHOR_RATIOS), (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="anchor_deltas")
        logits, boxes = [], []
        for f in feats:
            t = nn.relu(conv(f))
            logits.append(obj(t).astype(jnp.float32))
            boxes.append(deltas(t).astype(jnp.float32))
        return logits, boxes


class BoxHead(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        # x: (R, 7, 7, 256). detectron2 flattens NCHW — transpose to match
        # the FC weight layout for .pth import.
        r = x.shape[0]
        x = x.transpose(0, 3, 1, 2).reshape(r, -1).astype(self.dtype)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x))
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x))
        scores = nn.Dense(NUM_CLASSES + 1, dtype=self.dtype, param_dtype=jnp.float32,
                          name="cls_score")(x)
        deltas = nn.Dense(NUM_CLASSES * 4, dtype=self.dtype, param_dtype=jnp.float32,
                          name="bbox_pred")(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)


class MaskHead(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: (R, 14, 14, 256) → (R, 28, 28, NUM_CLASSES)
        for i in range(4):
            x = nn.relu(
                nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"mask_fcn{i + 1}")(x.astype(self.dtype))
            )
        x = nn.relu(
            nn.ConvTranspose(256, (2, 2), strides=(2, 2), dtype=self.dtype,
                             param_dtype=jnp.float32, name="deconv")(x)
        )
        x = nn.Conv(NUM_CLASSES, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="predictor")(x)
        return x.astype(jnp.float32)


# ------------------------------------------------------------ box utilities


def anchors_for_level(h: int, w: int, stride: int, size: float) -> np.ndarray:
    """(H*W*A, 4) XYXY anchors, detectron2 grid convention (centers at
    stride·(i, j))."""
    out = []
    for ratio in ANCHOR_RATIOS:
        area = size * size
        aw = np.sqrt(area / ratio)
        ah = aw * ratio
        out.append((-aw / 2, -ah / 2, aw / 2, ah / 2))
    base = np.array(out, np.float32)  # (A, 4)
    xs = np.arange(w, dtype=np.float32) * stride
    ys = np.arange(h, dtype=np.float32) * stride
    sx, sy = np.meshgrid(xs, ys, indexing="xy")
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # (HW, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def decode_boxes(anchors: Array, deltas: Array, weights=(1.0, 1.0, 1.0, 1.0)) -> Array:
    """detectron2 Box2BoxTransform.apply_deltas (dx,dy,dw,dh)."""
    wx, wy, ww, wh = weights
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + 0.5 * aw
    ay = anchors[:, 1] + 0.5 * ah

    dx = deltas[:, 0] / wx
    dy = deltas[:, 1] / wy
    dw = jnp.clip(deltas[:, 2] / ww, a_max=4.135)  # log(1000/16)
    dh = jnp.clip(deltas[:, 3] / wh, a_max=4.135)

    cx = dx * aw + ax
    cy = dy * ah + ay
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def clip_boxes(boxes: Array, height: Array, width: Array) -> Array:
    x1 = jnp.clip(boxes[:, 0], 0, width)
    y1 = jnp.clip(boxes[:, 1], 0, height)
    x2 = jnp.clip(boxes[:, 2], 0, width)
    y2 = jnp.clip(boxes[:, 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def iou_matrix(a: Array, b: Array) -> Array:
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-12)


def nms_fixed(boxes: Array, scores: Array, iou_thresh: float, max_out: int) -> tuple[Array, Array]:
    """Greedy NMS with static output size.

    Returns (keep_idx (max_out,), keep_valid (max_out,) bool). The O(N²) IoU
    matrix is materialized once; the greedy pass is a fori_loop of vector ops
    — fine on TPU for N ≤ a few thousand.
    """
    n = boxes.shape[0]
    iou = iou_matrix(boxes, boxes)

    def body(i, carry):
        alive, keep, valid = carry
        masked = jnp.where(alive, scores, -jnp.inf)
        j = jnp.argmax(masked)
        ok = masked[j] > -jnp.inf
        keep = keep.at[i].set(jnp.where(ok, j.astype(jnp.int32), 0))
        valid = valid.at[i].set(ok)
        # iou[j, j] == 1 > thresh, so suppressing also retires j itself
        alive = jnp.where(ok, alive & (iou[j] <= iou_thresh), alive)
        return alive, keep, valid

    # Initial carries derive from `scores` so they type as device-varying
    # under shard_map's static VMA checker (check_vma=True): constant
    # initializers type as replicated while the loop outputs are varying,
    # which the checker rejects — this used to force check_vma=False on the
    # WHOLE train step. `vfalse` is identically False (x & ~x, NaN-safe), so
    # values are unchanged and XLA folds the extra ops away.
    nan_mask = scores != scores
    vfalse = nan_mask & ~nan_mask
    alive0 = jnp.ones((n,), bool) | vfalse
    keep0 = jnp.zeros((max_out,), jnp.int32) + vfalse[0].astype(jnp.int32)
    valid0 = jnp.zeros((max_out,), bool) | vfalse[0]
    _, keep, valid = jax.lax.fori_loop(0, max_out, body, (alive0, keep0, valid0))
    return keep, valid


def _roi_sample_box(box, h, w, out_size: int, sampling: int, c: int, gather):
    """Shared ROIAlign-v2 sampling body (sub-bin sample grid, 4-tap bilinear
    blend, sub-bin mean). ``box`` is XYXY in FEATURE coords (aligned=True);
    ``gather(yc, xc) -> (n, n, C)`` fetches clipped integer taps — the only
    thing that differs between the single-level and flattened-multilevel
    paths."""
    x1, y1, x2, y2 = box
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)
    n = out_size * sampling
    # sample centers of n×n sub-bins
    xs = x1 + (jnp.arange(n) + 0.5) * bw / n - 0.5
    ys = y1 + (jnp.arange(n) + 0.5) * bh / n - 0.5
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)

    def cl(yi, xi):
        return (
            jnp.clip(yi.astype(jnp.int32), 0, h - 1),
            jnp.clip(xi.astype(jnp.int32), 0, w - 1),
        )

    # blend in the FEATURE dtype: the gathers materialize huge (R·n², C)
    # tensors (DS profile: 23 ms/step of the fused train step at f32) —
    # bf16 features halve that traffic; callers pick precision by casting
    # the features (f32 backend / bf16 fast provider)
    g00 = gather(*cl(y0, x0))
    dt = g00.dtype
    wx = (xs - x0)[None, :, None].astype(dt)
    wy = (ys - y0)[:, None, None].astype(dt)
    v = (
        g00 * (1 - wy) * (1 - wx)
        + gather(*cl(y0, x0 + 1)) * (1 - wy) * wx
        + gather(*cl(y0 + 1, x0)) * wy * (1 - wx)
        + gather(*cl(y0 + 1, x0 + 1)) * wy * wx
    )
    # average the sampling×sampling sub-bins
    return v.reshape(out_size, sampling, out_size, sampling, c).mean((1, 3))


def roi_align(feat: Array, boxes: Array, out_size: int, stride: float, sampling: int = 2) -> Array:
    """ROIAlign-v2 (aligned, continuous coordinates) on one FPN level.

    Args:
        feat: (H, W, C) one level's features.
        boxes: (R, 4) XYXY in image coordinates.
        out_size: output bins per side (7 box / 14 mask).
        stride: the level's stride (feature → image scale).
        sampling: sample points per bin side (detectron2 adaptive ratio ≈ 2
            at test scales; fixed here for static shapes).
    Returns:
        (R, out_size, out_size, C)
    """
    h, w, c = feat.shape
    boxes = boxes / stride  # to feature coords, aligned=True (pixel centers)

    def one_box(box):
        return _roi_sample_box(
            box, h, w, out_size, sampling, c,
            lambda yc, xc: feat[yc[:, None], xc[None, :]],  # (n, n, C)
        )

    return jax.vmap(one_box)(boxes)


def assign_fpn_level(boxes: Array) -> Array:
    """FPN level for each box: ⌊4 + log2(√area/224)⌋ clamped to [2, 5]."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(area) / 224 + 1e-8))
    return jnp.clip(lvl, 2, 5).astype(jnp.int32)


def _separable_roi_weights(
    lo: Array, hi: Array, size: int, out_size: int, sampling: int, dtype
) -> Array:
    """(R, out_size, size) one-hot-sparse interpolation matrix for one axis
    of ROIAlign-v2: row i holds the bilinear tap weights of output bin i
    against the `size` feature positions, with the sub-bin mean folded in
    (mean of products of per-axis factors = product of per-axis means).
    Tap indices clip to [0, size-1] exactly like the gather path — when both
    taps clip to the same border cell their weights sum to 1 there."""
    n = out_size * sampling
    span = jnp.maximum(hi - lo, 1e-6)
    s = lo[:, None] + (jnp.arange(n) + 0.5) * span[:, None] / n - 0.5  # (R, n)
    f0 = jnp.floor(s)
    frac = (s - f0).astype(dtype)
    i0 = jnp.clip(f0.astype(jnp.int32), 0, size - 1)
    i1 = jnp.clip(f0.astype(jnp.int32) + 1, 0, size - 1)
    grid = jnp.arange(size, dtype=jnp.int32)
    one = jnp.ones((), dtype)
    w = (grid[None, None] == i0[..., None]) * (one - frac[..., None]) + (
        grid[None, None] == i1[..., None]
    ) * frac[..., None]                                   # (R, n, size)
    return w.reshape(-1, out_size, sampling, size).mean(axis=2)


def multilevel_roi_align(
    feats: list[Array], boxes: Array, out_size: int, sampling: int = 2
) -> Array:
    """ROIAlign over P2..P5 with per-box level assignment, computed as
    SEPARABLE bilinear resampling — two batched matmuls per level against
    one-hot-sparse weight matrices (the paste_masks trick in reverse) —
    instead of per-sample-point gathers.

    Rationale (round-3 DS-step profile): the gather formulation materialized
    four (R·n², C) tap tensors per head — 512-byte random rows, ~10% of HBM
    peak — costing ~13 ms of the 41.7 ms fused DS train step (tap fusions
    6.9 + 3.5 ms, sub-bin reshapes 2.6 ms, index/flat-buffer DMA ~3 ms).
    The matmul form streams each level's features once per head at MXU
    rates. Every box is resampled against all four levels and the result of
    its assigned level selected — 4× redundant FLOPs, but FLOPs are ~100×
    cheaper than scattered HBM reads here; shapes stay static.

    Numerics: identical taps, clips, and sub-bin means as the gather path
    in exact arithmetic (parity-tested against
    :func:`multilevel_roi_align_gather`); f32 inputs pin Precision.HIGHEST
    so the MXU does not round detectron2-exact features through bf16.

    Size guard: the first einsum materializes a (R, H, out, C) intermediate
    per level. At the fused provider's shapes that is ≤~90 MB and the matmul
    form wins decisively; at the GT-tooling backend's full-res box-head
    shapes (R=1000, P2=256×848, f32) it would be ~1.8 GB — there the gather
    formulation is used instead. Shapes are static, so the choice is made
    once at trace time."""
    r = boxes.shape[0]
    h2, _, c = feats[0].shape
    inter_bytes = r * h2 * out_size * c * jnp.dtype(feats[0].dtype).itemsize
    if inter_bytes > 256 * 1024 * 1024:
        return multilevel_roi_align_gather(feats, boxes, out_size, sampling)
    lvl = assign_fpn_level(boxes) - 2                     # (R,) in [0, 3]
    dt = feats[0].dtype
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    out = None
    for li, feat in enumerate(feats[:4]):
        h, w, c = feat.shape
        b = boxes.astype(jnp.float32) / (2.0 ** (li + 2))
        wx = _separable_roi_weights(b[:, 0], b[:, 2], w, out_size, sampling, dt)
        wy = _separable_roi_weights(b[:, 1], b[:, 3], h, out_size, sampling, dt)
        # contract the wider spatial dim first (KITTI frames: W > H) so the
        # intermediate is R·H·out·C, the smaller of the two choices; the
        # (R, out, H, C) axis order measured 1.5× faster than (R, H, out, C)
        # at provider shapes — XLA needs no layout copy between the two dots
        # (micro-bench in PARITY.md round-3 notes)
        t = jnp.einsum("rjw,hwc->rjhc", wx, feat, precision=prec)
        o = jnp.einsum("rih,rjhc->rijc", wy, t, precision=prec)
        sel = (lvl == li)[:, None, None, None]
        out = o if out is None else jnp.where(sel, o, out)
    return out


def multilevel_roi_align_gather(
    feats: list[Array], boxes: Array, out_size: int, sampling: int = 2
) -> Array:
    """Gather-based reference formulation of :func:`multilevel_roi_align`
    (kept for parity tests; the matmul form above replaced it on the hot
    path — see its docstring for the profile numbers).

    All four levels are flattened into ONE (ΣHₗWₗ, C) buffer and each box
    gathers its bilinear taps from the row range of its assigned level —
    one gather pass total, instead of computing every level for every box
    and masking (which cost 4× the HBM traffic and dominated the 1.8 s/img
    profile noted in PARITY.md round 1)."""
    shapes = [(f.shape[0], f.shape[1]) for f in feats[:4]]
    c = feats[0].shape[-1]
    flat = jnp.concatenate([f.reshape(-1, c) for f in feats[:4]], axis=0)

    offs, off = [], 0
    for h, w in shapes:
        offs.append(off)
        off += h * w
    level_off = jnp.asarray(offs, jnp.int32)                      # (4,)
    level_h = jnp.asarray([s[0] for s in shapes], jnp.int32)
    level_w = jnp.asarray([s[1] for s in shapes], jnp.int32)
    level_stride = jnp.asarray([4.0, 8.0, 16.0, 32.0], jnp.float32)

    lvl = assign_fpn_level(boxes) - 2                             # (R,) in [0, 3]
    stride = level_stride[lvl]
    h_l = level_h[lvl]
    w_l = level_w[lvl]
    off_l = level_off[lvl]

    def one_box(box, stride, h, w, off):
        def gather(yc, xc):
            rows = off + yc[:, None] * w + xc[None, :]            # (n, n)
            return flat[rows]                                      # (n, n, C)

        return _roi_sample_box(box / stride, h, w, out_size, sampling, c, gather)

    return jax.vmap(one_box)(boxes, stride, h_l, w_l, off_l)


def paste_masks(masks28: Array, boxes: Array, out_h: int, out_w: int) -> Array:
    """Paste (R, 28, 28) mask logits into an (R, out_h, out_w) canvas by
    inverse bilinear sampling (detectron2 paste_masks_in_image analog).

    Computed as SEPARABLE bilinear interpolation — two small batched matmuls
    (R,H,28)·(R,28,28)·(R,28,W) — instead of per-pixel gathers from the
    28×28 source. Gathers with huge index sets from tiny arrays lower
    terribly on TPU: this op alone was 162 ms of the 270 ms/img provider
    cost before the rewrite (round-2 profile); the matmul form is <1 ms.
    The 1-D weight w[y, a] = max(0, 1 − |my(y) − a|) reproduces the bilinear
    taps exactly, including the zero-outside-the-box boundary behavior."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)

    a = jnp.arange(MASK_RES, dtype=jnp.float32)

    def weights(coords: Array, lo: Array, size: Array) -> Array:
        # (R, T, 28): bilinear weight of source cell a for target pixel t
        m = (coords[None, :] - lo[:, None]) / size[:, None] * MASK_RES - 0.5
        return jnp.clip(1.0 - jnp.abs(m[:, :, None] - a[None, None, :]), 0.0, 1.0)

    wy = weights(jnp.arange(out_h, dtype=jnp.float32) + 0.5, y1, bh)  # (R, H, 28)
    wx = weights(jnp.arange(out_w, dtype=jnp.float32) + 0.5, x1, bw)  # (R, W, 28)
    # HIGHEST precision: default MXU matmul rounds f32 through bf16, which
    # can flip pasted probabilities across the 0.5 binarization threshold
    # vs the elementwise reference taps (CLAUDE.md small-geometry rule)
    hi = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("rha,rab->rhb", wy, masks28.astype(jnp.float32), precision=hi)
    return jnp.einsum("rhb,rwb->rhw", tmp, wx, precision=hi)


# -------------------------------------------------------------- full model


class Detections(NamedTuple):
    boxes: Array    # (max_det, 4) XYXY in input-image coords
    scores: Array   # (max_det,)
    classes: Array  # (max_det,) int32 category ids (0..NUM_CLASSES-1)
    masks28: Array  # (max_det, 28, 28) probabilities
    valid: Array    # (max_det,) bool


class MaskRCNN(nn.Module):
    """Full static-shape inference graph. Input: one caffe-BGR-normalized
    image (H, W, 3) padded to static size + its true (height, width).

    The top-k/NMS sizes are attributes so tests can shrink them; defaults
    match detectron2 test-time config."""

    max_det: int = 32
    pre_nms_topk: int = RPN_PRE_NMS_TOPK
    post_nms_topk: int = RPN_POST_NMS_TOPK
    box_candidates: int = 1024
    score_thresh: float = ROI_SCORE_THRESH  # cfg.d2_score_thresh (trainer.py:175)
    dtype: Any = jnp.bfloat16
    roi_dtype: Any = jnp.float32  # ROIAlign gather/blend precision; the
    # training-time provider uses bf16 (halves the dominant gather traffic —
    # PARITY.md DS profile), the GT-tooling backend keeps detectron2-exact
    # f32 (even with the fast proposal budget)

    @nn.compact
    def __call__(self, image: Array, true_h: Array, true_w: Array) -> Detections:
        h, w, _ = image.shape
        feats = D2ResNet50(dtype=self.dtype, name="bottom_up")(image[None].astype(self.dtype))
        pyramid = FPN(dtype=self.dtype, name="fpn")(feats)
        logits, deltas = RPNHead(dtype=self.dtype, name="rpn_head")(pyramid)

        # ---- proposals (detectron2 find_top_rpn_proposals: per-level top-k,
        # then NMS keyed by level — boxes only suppress within their own
        # level — then a global post_nms_topk by score)
        all_boxes, all_scores, all_lvls = [], [], []
        for li, (lg, dl) in enumerate(zip(logits, deltas)):
            stride = 2 ** (li + 2)
            hl, wl = lg.shape[1], lg.shape[2]
            anch = jnp.asarray(anchors_for_level(hl, wl, stride, ANCHOR_SIZES[li]))
            scores_l = lg.reshape(-1)
            deltas_l = dl.reshape(-1, 4)
            k = min(self.pre_nms_topk, scores_l.shape[0])
            top_s, top_i = jax.lax.top_k(scores_l, k)
            boxes_l = decode_boxes(anch[top_i], deltas_l[top_i])
            boxes_l = clip_boxes(boxes_l, true_h, true_w)
            all_boxes.append(boxes_l)
            all_scores.append(top_s)
            all_lvls.append(jnp.full((k,), li, jnp.float32))
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        lvls = jnp.concatenate(all_lvls)
        # batched-NMS trick: offset each level into a disjoint coordinate
        # range so one joint NMS is exactly per-level NMS
        lvl_off = lvls[:, None] * (MAX_SIZE_TEST * 2.0)
        keep, valid = nms_fixed(boxes + lvl_off, scores, RPN_NMS_THRESH, self.post_nms_topk)
        proposals = boxes[keep] * valid[:, None]  # invalid → degenerate at 0

        # ---- box head
        roi_feats = [p[0].astype(self.roi_dtype) for p in pyramid]
        pooled = multilevel_roi_align(roi_feats, proposals, 7)
        cls_logits, box_deltas = BoxHead(dtype=self.dtype, name="box_head")(pooled)
        probs = jax.nn.softmax(cls_logits, axis=-1)[:, :NUM_CLASSES]  # drop bg

        # class-specific box regression
        r = proposals.shape[0]
        det_boxes = jax.vmap(
            lambda p, d: decode_boxes(
                jnp.broadcast_to(p[None], (NUM_CLASSES, 4)),
                d.reshape(NUM_CLASSES, 4),
                BOX_REG_WEIGHTS,
            )
        )(proposals, box_deltas)  # (R, NUM_CLASSES, 4)

        flat_scores = (probs * valid[:, None]).reshape(-1)  # (R*C,)
        flat_boxes = det_boxes.reshape(-1, 4)
        flat_cls = jnp.broadcast_to(
            jnp.arange(NUM_CLASSES, dtype=jnp.int32)[None], (r, NUM_CLASSES)
        ).reshape(-1)

        flat_scores = jnp.where(flat_scores >= self.score_thresh, flat_scores, 0.0)
        # prune to a workable candidate set, then class-offset NMS
        cand = min(self.box_candidates, flat_scores.shape[0])
        cs, ci = jax.lax.top_k(flat_scores, cand)
        cboxes = clip_boxes(flat_boxes[ci], true_h, true_w)
        ccls = flat_cls[ci]
        # offset boxes per class so NMS is per-class (batched-NMS trick)
        off = ccls.astype(jnp.float32)[:, None] * (MAX_SIZE_TEST * 2.0)
        keep2, valid2 = nms_fixed(cboxes + off, cs, ROI_NMS_THRESH, self.max_det)
        valid2 = valid2 & (cs[keep2] > 0)
        final_boxes = cboxes[keep2]
        final_scores = cs[keep2] * valid2
        final_cls = ccls[keep2]

        # ---- mask head
        mpooled = multilevel_roi_align(roi_feats, final_boxes, 14)
        mlogits = MaskHead(dtype=self.dtype, name="mask_head")(mpooled)
        midx = jnp.arange(self.max_det)
        masks28 = jax.nn.sigmoid(mlogits[midx, :, :, final_cls])

        return Detections(final_boxes, final_scores, final_cls, masks28, valid2)


# ---------------------------------------------------------- host interface


def preprocess_np(
    img_rgb: np.ndarray, input_hw: tuple[int, int] | None = None
) -> tuple[np.ndarray, float, int, int]:
    """ResizeShortestEdge(1024, 2048) + BGR caffe normalization + pad to the
    static input shape (utils.py:53-74 get_detectron2_input analog).

    Returns (padded (Hs, Ws, 3) float32, scale, resized_h, resized_w).
    """
    import cv2

    h, w = img_rgb.shape[:2]
    sh, sw = input_hw if input_hw is not None else static_input_shape()
    scale = min(MIN_SIZE_TEST / min(h, w), MAX_SIZE_TEST / max(h, w), sh / h, sw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = cv2.resize(img_rgb.astype(np.float32), (nw, nh))
    bgr = resized[:, :, ::-1] - np.array(PIXEL_MEAN_BGR, np.float32)
    out = np.zeros((sh, sw, 3), np.float32)
    out[:nh, :nw] = bgr[:sh, :sw]
    return out, scale, nh, nw


def static_input_shape() -> tuple[int, int]:
    """Static padded input for KITTI-sized frames: ResizeShortestEdge(1024,
    2048) maps 375×1242 → 619×2048, rounded up to /64 for clean FPN strides."""
    return 640, 2048


# fast proposal budget (256/256/512 instead of detectron2's test-time
# 1000/1000) — minor quality change, much cheaper static NMS; shared by the
# GT-tooling backend (fast=True) and the training-time provider. ROIAlign
# precision is NOT part of the budget: the provider opts into bf16 pooling
# separately (roi_dtype), the GT-tooling backend keeps detectron2-exact f32
# even with fast=True.
FAST_BUDGET = dict(pre_nms_topk=256, post_nms_topk=256, box_candidates=512)


def build_model_and_weights(
    max_det: int,
    init_h: int,
    init_w: int,
    weights_path: str | None = None,
    fast: bool = False,
    score_thresh: float = ROI_SCORE_THRESH,
    roi_dtype: Any = jnp.float32,
) -> tuple[MaskRCNN, dict]:
    """Shared construction + weights-or-random-init fallback for every
    Mask R-CNN consumer (backend / provider), so the proposal budget and
    import strictness can't silently diverge between GT tooling and
    training-time masks."""
    model = MaskRCNN(max_det=max_det, score_thresh=score_thresh,
                     roi_dtype=roi_dtype, **(FAST_BUDGET if fast else {}))
    if weights_path:
        variables = import_detectron2_pth(weights_path, model)
    else:
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((init_h, init_w, 3)),
            jnp.array(float(init_h)),
            jnp.array(float(init_w)),
        )
    return model, variables


def paste_threshold_union_ready(det: Detections, boxes: Array, out_h: int, out_w: int):
    """Paste detections to (max_det, out_h, out_w) and binarize at 0.5,
    invalid slots zeroed — the shared tail of both inference pipelines."""
    pasted = paste_masks(det.masks28, boxes, out_h, out_w)
    return (pasted >= 0.5) & det.valid[:, None, None]


class MaskRCNNBackend:
    """Host-facing single-image inference (GT tooling / eval).

    The whole pipeline — detection, full-res mask pasting, thresholding —
    runs as one jitted program per (output height, width); only fixed-size
    uint8 masks and the detection table cross the host boundary."""

    def __init__(self, weights_path: str | None = None, max_det: int = 32,
                 fast: bool = False, score_thresh: float = ROI_SCORE_THRESH,
                 input_hw: tuple[int, int] | None = None,
                 mesh=None):
        """fast=True shrinks the proposal top-k budget (FAST_BUDGET) —
        ~minor quality change, much cheaper static NMS.

        ``mesh``: an optional 1-D 'spatial' mesh (parallel.make_spatial_mesh)
        — the padded input is sharded along image WIDTH across its devices,
        so the full-res backbone/FPN (the bulk of the FLOPs at 640×2048)
        partitions spatially with XLA-inserted halo exchanges over ICI; the
        small ROI stages all-gather. Single-image model parallelism for when
        there is no batch to split (GT tooling latency)."""
        sh, sw = input_hw if input_hw is not None else static_input_shape()
        assert sh % 64 == 0 and sw % 64 == 0, "input shape must be /64 for FPN"
        self.input_hw = (sh, sw)
        self.model, self.variables = build_model_and_weights(
            max_det, sh, sw, weights_path, fast, score_thresh
        )

        def run(variables, padded, nh, nw, scale, out_h, out_w):
            det = self.model.apply(variables, padded, nh, nw)
            boxes = det.boxes / scale
            masks = paste_threshold_union_ready(det, boxes, out_h, out_w)
            return masks.astype(jnp.uint8), boxes, det.classes, det.scores, det.valid

        def run_batch(variables, padded, nh, nw, scale, out_h, out_w):
            def one(p, h_, w_, s):
                return run(variables, p, h_, w_, s, out_h, out_w)

            return jax.vmap(one)(padded, nh, nw, scale)

        mean_bgr = jnp.asarray(PIXEL_MEAN_BGR, jnp.float32)

        def run_union_u8(variables, resized_u8, scale, out_h, out_w):
            """uint8 shortest-edge-resized input → union mask only.

            Moves BGR/normalize/pad on device and reduces the detections to
            ONE union mask inside the program: host↔device traffic per image
            drops from 24 MB f32 padded input + max_det full-res masks out
            (~15 MB) to the resized u8 frame in (~4 MB) + (out_h, out_w) u8
            union out (~0.5 MB). The u8-resize input is also closer to
            detectron2's own preprocessing than the f32 path: detectron2's
            ResizeShortestEdge resizes the uint8 image (PIL/cv2 semantics)
            before float conversion."""
            nh, nw = resized_u8.shape[:2]  # static per specialization
            bgr = resized_u8[..., ::-1].astype(jnp.float32) - mean_bgr
            padded = jnp.zeros((sh, sw, 3), jnp.float32).at[:nh, :nw].set(bgr)
            det = self.model.apply(
                variables, padded, jnp.float32(nh), jnp.float32(nw)
            )
            boxes = det.boxes / scale
            masks = paste_threshold_union_ready(det, boxes, out_h, out_w)
            return jnp.any(masks, axis=0).astype(jnp.uint8)

        def run_union_u8_batch(variables, resized_u8, scale, out_h, out_w):
            return jax.vmap(
                lambda im, s: run_union_u8(variables, im, s, out_h, out_w)
            )(resized_u8, scale)

        if mesh is None:
            self._run = jax.jit(run, static_argnames=("out_h", "out_w"))
            self._run_batch = jax.jit(run_batch, static_argnames=("out_h", "out_w"))
            self._run_union_u8_batch = jax.jit(
                run_union_u8_batch, static_argnames=("out_h", "out_w")
            )
        else:
            # batch axis conflicts with spatial sharding
            self._run_batch = None
            self._run_union_u8_batch = None
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import SPATIAL_AXIS

            rep = NamedSharding(mesh, P())
            img = NamedSharding(mesh, P(None, SPATIAL_AXIS, None))
            self._run = jax.jit(
                run,
                static_argnames=("out_h", "out_w"),
                in_shardings=(rep, img, rep, rep, rep),
                out_shardings=rep,
            )

    def predict(self, img_rgb: np.ndarray):
        """→ (masks (N, H, W) uint8, boxes (N, 4), classes (N,), scores (N,))
        at the original image resolution."""
        h, w = img_rgb.shape[:2]
        padded, scale, nh, nw = preprocess_np(img_rgb, self.input_hw)
        masks, boxes, classes, scores, valid = jax.device_get(
            self._run(
                self.variables,
                jnp.asarray(padded),
                jnp.array(float(nh)),
                jnp.array(float(nw)),
                jnp.array(scale, jnp.float32),
                h,
                w,
            )
        )
        keep = valid.astype(bool)
        return masks[keep], boxes[keep], classes[keep], scores[keep]

    def predict_batch(self, imgs_rgb):
        """Batch of same-(H, W) images → list of per-image
        (masks, boxes, classes, scores), one jitted vmapped dispatch.

        Amortizes the per-image dispatch + host↔device transfer that
        dominates offline sweeps over tens of thousands of frames
        (tools/precompute_masks.py --batch). Per-image results are identical
        to :meth:`predict` (vmap of the same program). Not available with a
        spatial mesh — the batch axis would conflict with the width
        sharding."""
        assert self._run_batch is not None, (
            "predict_batch is unavailable with a spatial mesh; use predict()"
        )
        h, w = np.asarray(imgs_rgb[0]).shape[:2]
        pp = []
        for im in imgs_rgb:
            im = np.asarray(im)
            assert im.shape[:2] == (h, w), "predict_batch needs same-size images"
            pp.append(preprocess_np(im, self.input_hw))
        masks, boxes, classes, scores, valid = jax.device_get(
            self._run_batch(
                self.variables,
                jnp.asarray(np.stack([p[0] for p in pp])),
                jnp.asarray(np.array([p[2] for p in pp], np.float32)),
                jnp.asarray(np.array([p[3] for p in pp], np.float32)),
                jnp.asarray(np.array([p[1] for p in pp], np.float32)),
                h,
                w,
            )
        )
        out = []
        for i in range(len(pp)):
            keep = valid[i].astype(bool)
            out.append((masks[i][keep], boxes[i][keep], classes[i][keep],
                        scores[i][keep]))
        return out

    def predict_union_batch(self, imgs_rgb):
        """Batch of same-(H, W) images → (B, H, W) uint8 0/1 union masks in
        one vmapped dispatch with minimal host↔device transfer (the
        union-only / u8-input program — see ``run_union_u8``). The fast
        path for offline union-mask sweeps (tools/precompute_masks.py);
        per-instance results still come from :meth:`predict`."""
        assert self._run_union_u8_batch is not None, (
            "predict_union_batch is unavailable with a spatial mesh"
        )
        import cv2

        h, w = np.asarray(imgs_rgb[0]).shape[:2]
        sh, sw = self.input_hw
        scale = min(MIN_SIZE_TEST / min(h, w), MAX_SIZE_TEST / max(h, w),
                    sh / h, sw / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        resized = []
        for im in imgs_rgb:
            im = np.asarray(im)
            assert im.shape[:2] == (h, w), "same-size images required"
            resized.append(cv2.resize(im, (nw, nh)))  # uint8 in, uint8 out
        return np.asarray(jax.device_get(self._run_union_u8_batch(
            self.variables,
            jnp.asarray(np.stack(resized)),
            jnp.full((len(resized),), scale, jnp.float32),
            h,
            w,
        )))

    def predict_union(self, img_rgb: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 → (H, W) uint8 0/1 union mask (the same program
        as :meth:`predict_union_batch` at B=1 — bitwise identical to it)."""
        return self.predict_union_batch([img_rgb])[0]


class MaskRCNNProvider:
    """Batched live union-mask provider backed by the JAX Mask R-CNN
    (replaces the reference's per-step frozen detectron2 inference,
    trainer.py:278-279 + loss_utils.py:102-124).

    The whole batch runs as ONE jitted dispatch at a static inference
    resolution of ``d2_infer_scale×`` the training resolution (default 2×,
    e.g. 384×1280 for 192×640 training). Deliberate deviation from the
    reference, which upsamples each frame to 375×1242 and lets detectron2
    resize the shortest edge to 1024 (mono_dataset.py:111, utils.py:53-74)
    — a per-image full-res pass costs ~1.8 s/img on TPU (PARITY.md) and
    would dominate the train step."""

    def __init__(self, cfg):
        import os

        from ..geometry import resize_bilinear

        scale = int(getattr(cfg, "d2_infer_scale", 2))
        ih, iw = cfg.height * scale, cfg.width * scale
        assert ih % 64 == 0 and iw % 64 == 0, "d2 inference shape must be /64 for FPN"
        weights = os.path.join(cfg.log_dir, "model_final_detectron2.pth")
        if not os.path.exists(weights):
            # Fail fast: a DS/DC run supervised by a randomly initialized
            # Mask R-CNN trains the mask×map / BCE terms against garbage with
            # no other symptom. The reference crashes on the missing .pth too
            # (trainer.py:170-179); tests/tooling opt in explicitly.
            if not getattr(cfg, "d2_allow_random_weights", False):
                raise FileNotFoundError(
                    f"mask_provider=maskrcnn needs detectron2 weights at "
                    f"{weights} — place model_final_detectron2.pth in log_dir, "
                    f"or set d2_allow_random_weights=true to accept randomly "
                    f"initialized masks (tests/smoke only)"
                )
            print(
                f"WARNING: {weights} not found — Mask R-CNN provider running "
                f"with RANDOM weights (d2_allow_random_weights); DS/DC "
                f"supervision is garbage. Do not train real runs like this.",
                flush=True,
            )
            weights = None
        self.model, self.variables = build_model_and_weights(
            cfg.d2_max_instances, ih, iw, weights,
            fast=True, score_thresh=cfg.d2_score_thresh,
            roi_dtype=jnp.bfloat16,
        )

        out_h, out_w = cfg.height, cfg.width
        mean_bgr = jnp.asarray(PIXEL_MEAN_BGR, jnp.float32)

        def union_fn(variables, images_u8):
            """(B, H0, W0, 3) uint8 → (B, out_h, out_w) f32 union masks.
            Pure (traceable) — this is what the fused train step inlines
            (training.py, cfg.d2_fuse_step); ``_run`` is its jitted twin for
            the standalone host-driven path."""
            x = resize_bilinear(images_u8.astype(jnp.float32), ih, iw)
            x = x[..., ::-1] - mean_bgr  # RGB→BGR caffe normalization

            def one(img):
                det = self.model.apply(
                    variables, img, jnp.float32(ih), jnp.float32(iw)
                )
                boxes = det.boxes / float(scale)  # back to training coords
                keep = paste_threshold_union_ready(det, boxes, out_h, out_w)
                return jnp.max(keep, axis=0).astype(jnp.float32)

            return jax.vmap(one)(x)

        self.union_fn = union_fn
        self._run = jax.jit(union_fn)

    def union_masks_from_images(
        self, images_rgb: np.ndarray, height: int, width: int, variables: dict | None = None
    ) -> np.ndarray:
        """(B, H0, W0, 3) uint8 RGB → (B, height, width) float union masks —
        one jitted device dispatch for the whole batch. ``variables``
        overrides the provider's own tree (the trainer passes its frozen
        copy when the provider is fused into the step, since donation may
        have invalidated ``self.variables``)."""
        return self._run(self.variables if variables is None else variables,
                         jnp.asarray(images_rgb))

    def union_masks(self, keys, height, width):  # MaskProvider protocol
        raise RuntimeError(
            "MaskRCNNProvider needs images, not sample keys — the trainer "
            "must call union_masks_from_images. (A keyed lookup would "
            "silently train DS/DC against all-zero masks.)"
        )


# ------------------------------------------------------------- .pth import


_BN_LEAF = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def torch_d2_key_to_flax(key: str) -> tuple[str, tuple, str] | None:
    """Map one detectron2 key to (collection, flax path, kind) where kind ∈
    {conv, convT, fc, bias, bn}. Returns None for ignorable keys."""
    parts = key.split(".")

    def bn(path_prefix: tuple, leaf: str):
        coll, l = _BN_LEAF[leaf]
        return coll, path_prefix + (l,), "bn"

    if key.startswith("backbone.bottom_up.stem.conv1"):
        if parts[-1] == "weight" and parts[-2] == "conv1":
            return "params", ("bottom_up", "stem_conv1", "kernel"), "conv"
        if parts[-2] == "norm":
            return bn(("bottom_up", "stem_bn1"), parts[-1])
    if key.startswith("backbone.bottom_up.res"):
        stage = parts[2]          # res2..res5
        block = parts[3]          # 0..n
        name = f"{stage}_{block}"
        rest = parts[4:]
        if rest[0] == "shortcut":
            if rest[-1] == "weight" and rest[-2] == "shortcut":
                return "params", ("bottom_up", name, "downsample_conv", "kernel"), "conv"
            if rest[-2] == "norm":
                return bn(("bottom_up", name, "downsample_bn"), rest[-1])
        if rest[0].startswith("conv"):
            idx = rest[0][-1]
            if rest[-1] == "weight" and rest[-2] == rest[0]:
                return "params", ("bottom_up", name, f"conv{idx}", "kernel"), "conv"
            if rest[-2] == "norm":
                return bn(("bottom_up", name, f"bn{idx}"), rest[-1])
    if key.startswith("backbone.fpn_lateral") or key.startswith("backbone.fpn_output"):
        name = parts[1]
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        kind = "conv" if parts[-1] == "weight" else "bias"
        return "params", ("fpn", name, leaf), kind
    if key.startswith("proposal_generator.rpn_head"):
        name = parts[2]  # conv / objectness_logits / anchor_deltas
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        return "params", ("rpn_head", name, leaf), "conv" if leaf == "kernel" else "bias"
    if key.startswith("roi_heads.box_head.fc"):
        name = parts[2]
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        return "params", ("box_head", name, leaf), "fc" if leaf == "kernel" else "bias"
    if key.startswith("roi_heads.box_predictor"):
        name = parts[2]  # cls_score / bbox_pred
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        return "params", ("box_head", name, leaf), "fc" if leaf == "kernel" else "bias"
    if key.startswith("roi_heads.mask_head"):
        name = parts[2]  # mask_fcn1..4 / deconv / predictor
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        kind = "convT" if name == "deconv" and leaf == "kernel" else (
            "conv" if leaf == "kernel" else "bias"
        )
        return "params", ("mask_head", name, leaf), kind
    return None


# keys in a detectron2 R50-FPN checkpoint that deliberately have no flax
# counterpart (constants re-derived here / training-only state)
_IGNORABLE_D2_PREFIXES = (
    "proposal_generator.anchor_generator.",  # cell anchors — rebuilt in anchors_for_level
    "pixel_mean",
    "pixel_std",
)


def import_detectron2_state_dict(sd: dict, model: MaskRCNN, strict: bool = True) -> dict:
    """Map an in-memory detectron2 state dict onto the MaskRCNN variable
    tree. Layout conversions (each verified numerically in
    tests/test_maskrcnn.py::TestD2Import):

    * conv weight OIHW → HWIO (transpose 2,3,1,0)
    * ConvTranspose2d weight (in, out, kh, kw) → flax ConvTranspose HWIO
      (transpose 2,3,0,1) **plus a spatial flip** — torch's deconv is the
      gradient of conv (kernel spatially reversed vs. lax.conv_transpose)
    * FC weight (out, in) → (in, out)

    With ``strict`` every key must either map or match a known-ignorable
    prefix, and every leaf of the model's variable tree must be filled.
    """
    from ..checkpoints import _unflatten, merge_partial

    flat: dict[tuple, np.ndarray] = {}
    unmapped: list[str] = []
    for key, val in sd.items():
        mapped = torch_d2_key_to_flax(key)
        if mapped is None:
            if not key.startswith(_IGNORABLE_D2_PREFIXES):
                unmapped.append(key)
            continue
        coll, p, kind = mapped
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        if kind == "conv" and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)
        elif kind == "convT" and arr.ndim == 4:
            arr = arr.transpose(2, 3, 0, 1)[::-1, ::-1]
        elif kind == "fc" and arr.ndim == 2:
            arr = arr.T
        flat[(coll,) + p] = arr
    if strict and unmapped:
        raise ValueError(f"unmapped detectron2 keys ({len(unmapped)}): {unmapped[:8]} ...")
    loaded = _unflatten(flat)

    # shape-only template — eval_shape avoids actually running the model
    sh, sw = static_input_shape()
    template_shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((sh, sw, 3)),
        jnp.array(float(sh)), jnp.array(float(sw)),
    )
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template_shapes)
    if strict:
        # count + shape check: every template leaf must be provided
        tmpl_leaves = jax.tree.leaves(template)
        if len(flat) != len(tmpl_leaves):
            missing = _describe_unfilled(template, loaded)
            raise ValueError(
                f"checkpoint fills {len(flat)} leaves but the model has "
                f"{len(tmpl_leaves)}; unfilled: {missing[:8]} ..."
            )
    merged = merge_partial(template, loaded)
    if strict:
        for p, (a, b) in _zip_leaves(merged, template):
            if a.shape != b.shape:
                raise ValueError(f"shape mismatch at {p}: got {a.shape}, model wants {b.shape}")
    return merged


def _zip_leaves(a: dict, b: dict):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = jax.tree.leaves(b)
    return [("/".join(str(k) for k in p), (x, y)) for (p, x), y in zip(fa, fb)]


def _describe_unfilled(template: dict, loaded: dict) -> list[str]:
    have = set()

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        else:
            have.add(path)

    walk(loaded, ())
    out = []

    def walk_t(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk_t(v, path + (k,))
        elif path not in have:
            out.append("/".join(path))

    walk_t(jax.tree.map(lambda x: x, template), ())
    return out


def import_detectron2_pth(path: str, model: MaskRCNN, strict: bool = True) -> dict:
    """Load the reference's ``model_final_detectron2.pth`` (trainer.py:165-179)
    into the MaskRCNN variable tree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return import_detectron2_state_dict(sd, model, strict=strict)
