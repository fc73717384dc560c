"""Independent PyTorch twin of the full Mask R-CNN R50-FPN inference
pipeline, built from the detectron2 architecture spec (config
``mask_rcnn_R_50_FPN`` as consumed by the reference at trainer.py:165-179 —
spec, not code: detectron2 is not installed here and nothing is copied).

Purpose (tests/test_maskrcnn.py::TestTorchPipelineParity): the twin's
``state_dict()`` serializes with ``torch.save`` into a REAL
detectron2-key-format ``.pth`` that ``import_detectron2_pth`` must consume,
and the twin's forward — torch convs, frozen BN, grid-sample ROIAlign, its
own greedy NMS — must reproduce the JAX port's detections end to end. The
two implementations share only the spec (anchor grid, Box2Box transform,
budgets); every op is implemented independently (e.g. ROIAlign here is
4-tap bilinear in torch vs the flattened-gather JAX kernel).

torchvision is NOT installed, so NMS/ROIAlign are written out here.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

NUM_CLASSES = 11
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
ANCHOR_SIZES = (32, 64, 128, 256, 512)
BOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
RPN_NMS_THRESH = 0.7
ROI_NMS_THRESH = 0.5
MAX_SIZE_TEST = 2048


class FrozenBN(nn.Module):
    """Inference-mode BatchNorm with stats in the state dict
    (detectron2 FrozenBatchNorm2d analog)."""

    def __init__(self, ch: int):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(ch))
        self.bias = nn.Parameter(torch.zeros(ch))
        self.register_buffer("running_mean", torch.zeros(ch))
        self.register_buffer("running_var", torch.ones(ch))

    def forward(self, x):
        scale = self.weight / torch.sqrt(self.running_var + 1e-5)
        return x * scale[None, :, None, None] + (
            self.bias - self.running_mean * scale
        )[None, :, None, None]


class ConvNorm(nn.Conv2d):
    """Conv2d whose state-dict names are ``<name>.weight`` +
    ``<name>.norm.*`` — the detectron2 Conv2d-with-norm layout."""

    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__(cin, cout, k, stride, padding, bias=False)
        self.norm = FrozenBN(cout)

    def forward(self, x):
        return self.norm(super().forward(x))


class BottleneckT(nn.Module):
    """caffe-style bottleneck: stride on the FIRST 1×1 (stride_in_1x1)."""

    def __init__(self, cin: int, width: int, stride: int):
        super().__init__()
        self.conv1 = ConvNorm(cin, width, 1, stride)
        self.conv2 = ConvNorm(width, width, 3, 1, padding=1)
        self.conv3 = ConvNorm(width, width * 4, 1)
        if stride != 1 or cin != width * 4:
            self.shortcut = ConvNorm(cin, width * 4, 1, stride)

    def forward(self, x):
        idn = self.shortcut(x) if hasattr(self, "shortcut") else x
        out = F.relu(self.conv1(x))
        out = F.relu(self.conv2(out))
        return F.relu(self.conv3(out) + idn)


class Stem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = ConvNorm(3, 64, 7, 2, padding=3)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        return F.max_pool2d(x, 3, 2, padding=1)


class BottomUp(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = Stem()
        cin = 64
        for stage, (width, n) in enumerate(zip((64, 128, 256, 512), (3, 4, 6, 3))):
            blocks = []
            for b in range(n):
                stride = (1 if stage == 0 else 2) if b == 0 else 1
                blocks.append(BottleneckT(cin, width, stride))
                cin = width * 4
            setattr(self, f"res{stage + 2}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.stem(x)
        feats = []
        for s in range(2, 6):
            x = getattr(self, f"res{s}")(x)
            feats.append(x)
        return feats  # C2..C5


class Backbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.bottom_up = BottomUp()
        for i, cin in enumerate((256, 512, 1024, 2048)):
            setattr(self, f"fpn_lateral{i + 2}", nn.Conv2d(cin, 256, 1))
            setattr(self, f"fpn_output{i + 2}", nn.Conv2d(256, 256, 3, padding=1))

    def forward(self, x):
        c = self.bottom_up(x)
        lat = [getattr(self, f"fpn_lateral{i + 2}")(ci) for i, ci in enumerate(c)]
        p = [None] * 4
        p[3] = lat[3]
        for i in (2, 1, 0):
            up = F.interpolate(p[i + 1], scale_factor=2, mode="nearest")
            p[i] = lat[i] + up[:, :, : lat[i].shape[2], : lat[i].shape[3]]
        outs = [getattr(self, f"fpn_output{i + 2}")(pi) for i, pi in enumerate(p)]
        p6 = F.max_pool2d(outs[3], 1, 2)
        return outs + [p6]  # P2..P6


class RPNHeadT(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = nn.Conv2d(256, 256, 3, padding=1)
        self.objectness_logits = nn.Conv2d(256, len(ANCHOR_RATIOS), 1)
        self.anchor_deltas = nn.Conv2d(256, 4 * len(ANCHOR_RATIOS), 1)

    def forward(self, feats):
        logits, deltas = [], []
        for f in feats:
            t = F.relu(self.conv(f))
            logits.append(self.objectness_logits(t))
            deltas.append(self.anchor_deltas(t))
        return logits, deltas


class ProposalGenerator(nn.Module):
    def __init__(self):
        super().__init__()
        self.rpn_head = RPNHeadT()


class BoxHeadT(nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = nn.Linear(7 * 7 * 256, 1024)
        self.fc2 = nn.Linear(1024, 1024)

    def forward(self, x):  # x: (R, 256, 7, 7) NCHW
        x = x.flatten(1)
        return F.relu(self.fc2(F.relu(self.fc1(x))))


class BoxPredictor(nn.Module):
    def __init__(self):
        super().__init__()
        self.cls_score = nn.Linear(1024, NUM_CLASSES + 1)
        self.bbox_pred = nn.Linear(1024, NUM_CLASSES * 4)


class MaskHeadT(nn.Module):
    def __init__(self):
        super().__init__()
        for i in range(4):
            setattr(self, f"mask_fcn{i + 1}", nn.Conv2d(256, 256, 3, padding=1))
        self.deconv = nn.ConvTranspose2d(256, 256, 2, 2)
        self.predictor = nn.Conv2d(256, NUM_CLASSES, 1)

    def forward(self, x):
        for i in range(4):
            x = F.relu(getattr(self, f"mask_fcn{i + 1}")(x))
        x = F.relu(self.deconv(x))
        return self.predictor(x)


class ROIHeads(nn.Module):
    def __init__(self):
        super().__init__()
        self.box_head = BoxHeadT()
        self.box_predictor = BoxPredictor()
        self.mask_head = MaskHeadT()


# ----------------------------------------------------------------- box math


def anchors_for_level_t(h: int, w: int, stride: int, size: float) -> torch.Tensor:
    base = []
    for ratio in ANCHOR_RATIOS:
        aw = math.sqrt(size * size / ratio)
        ah = aw * ratio
        base.append((-aw / 2, -ah / 2, aw / 2, ah / 2))
    base = torch.tensor(base)  # (A, 4)
    xs = torch.arange(w, dtype=torch.float32) * stride
    ys = torch.arange(h, dtype=torch.float32) * stride
    sy, sx = torch.meshgrid(ys, xs, indexing="ij")
    shifts = torch.stack([sx, sy, sx, sy], -1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def decode_boxes_t(anchors, deltas, weights=(1.0, 1.0, 1.0, 1.0)):
    wx, wy, ww, wh = weights
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + 0.5 * aw
    ay = anchors[:, 1] + 0.5 * ah
    dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
    dw = torch.clamp(deltas[:, 2] / ww, max=4.135)
    dh = torch.clamp(deltas[:, 3] / wh, max=4.135)
    cx, cy = dx * aw + ax, dy * ah + ay
    w, h = torch.exp(dw) * aw, torch.exp(dh) * ah
    return torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def clip_boxes_t(boxes, h, w):
    return torch.stack(
        [boxes[:, 0].clamp(0, w), boxes[:, 1].clamp(0, h),
         boxes[:, 2].clamp(0, w), boxes[:, 3].clamp(0, h)], -1
    )


def nms_t(boxes, scores, thresh: float, max_out: int):
    """Greedy score-ordered NMS (torch loop). Returns (keep, valid) with the
    same fixed-size semantics as the JAX ``nms_fixed``."""
    area = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
    keep, valid = [], []
    alive = torch.ones(len(boxes), dtype=torch.bool)
    for _ in range(max_out):
        masked = torch.where(alive, scores, torch.tensor(-torch.inf))
        j = int(torch.argmax(masked))
        ok = bool(masked[j] > -torch.inf)
        keep.append(j if ok else 0)
        valid.append(ok)
        if ok:
            lt = torch.maximum(boxes[j, :2], boxes[:, :2])
            rb = torch.minimum(boxes[j, 2:], boxes[:, 2:])
            inter = (rb - lt).clamp(min=0).prod(-1)
            iou = inter / (area[j] + area - inter + 1e-12)
            alive = alive & (iou <= thresh)
    return torch.tensor(keep, dtype=torch.long), torch.tensor(valid)


def roi_align_t(feat: torch.Tensor, boxes: torch.Tensor, out_size: int,
                stride: float, sampling: int = 2) -> torch.Tensor:
    """ROIAlign-v2 (aligned) via explicit 4-tap bilinear in torch — an
    independent implementation of the same spec as the JAX gather kernel.

    feat: (C, H, W); boxes: (R, 4) image coords → (R, C, out, out)."""
    c, h, w = feat.shape
    boxes = boxes / stride
    n = out_size * sampling
    outs = []
    for box in boxes:
        x1, y1, x2, y2 = box
        bw = (x2 - x1).clamp(min=1e-6)
        bh = (y2 - y1).clamp(min=1e-6)
        xs = x1 + (torch.arange(n) + 0.5) * bw / n - 0.5
        ys = y1 + (torch.arange(n) + 0.5) * bh / n - 0.5
        x0, y0 = torch.floor(xs), torch.floor(ys)
        fx, fy = xs - x0, ys - y0

        def cl(v, hi):
            return v.long().clamp(0, hi - 1)

        g = lambda yi, xi: feat[:, cl(yi, h)][:, :, cl(xi, w)]  # noqa: E731
        v = (
            g(y0, x0) * (1 - fy)[None, :, None] * (1 - fx)[None, None, :]
            + g(y0, x0 + 1) * (1 - fy)[None, :, None] * fx[None, None, :]
            + g(y0 + 1, x0) * fy[None, :, None] * (1 - fx)[None, None, :]
            + g(y0 + 1, x0 + 1) * fy[None, :, None] * fx[None, None, :]
        )
        outs.append(v.reshape(c, out_size, sampling, out_size, sampling).mean((2, 4)))
    return torch.stack(outs)


def assign_fpn_level_t(boxes: torch.Tensor) -> torch.Tensor:
    area = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
    lvl = torch.floor(4 + torch.log2(torch.sqrt(area) / 224 + 1e-8))
    return lvl.clamp(2, 5).long()


def multilevel_roi_align_t(feats, boxes, out_size: int) -> torch.Tensor:
    lvl = assign_fpn_level_t(boxes)
    out = torch.zeros(len(boxes), 256, out_size, out_size)
    for li in range(4):
        sel = lvl == li + 2
        if sel.any():
            out[sel] = roi_align_t(feats[li][0], boxes[sel], out_size, 2.0 ** (li + 2))
    return out


def paste_masks_t(masks28: torch.Tensor, boxes: torch.Tensor, out_h: int,
                  out_w: int) -> torch.Tensor:
    """detectron2-style paste via the canonical torch grid_sample
    (align_corners=False, zeros padding) — the reference op the JAX
    separable-matmul paste must match."""
    r = len(boxes)
    ys = torch.arange(out_h, dtype=torch.float32) + 0.5
    xs = torch.arange(out_w, dtype=torch.float32) + 0.5
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    gy = (ys[None] - y1[:, None]) / (y2 - y1).clamp(min=1e-6)[:, None] * 2 - 1
    gx = (xs[None] - x1[:, None]) / (x2 - x1).clamp(min=1e-6)[:, None] * 2 - 1
    grid = torch.stack(
        [gx[:, None, :].expand(r, out_h, out_w), gy[:, :, None].expand(r, out_h, out_w)],
        dim=-1,
    )
    return F.grid_sample(
        masks28[:, None], grid, mode="bilinear", padding_mode="zeros",
        align_corners=False,
    )[:, 0]


# ---------------------------------------------------------------- full twin


class MaskRCNNTwin(nn.Module):
    """state_dict() serializes with exactly the detectron2 R50-FPN key
    layout that ``torch_d2_key_to_flax`` consumes."""

    def __init__(self, max_det: int = 8, pre_nms_topk: int = 64,
                 post_nms_topk: int = 32, box_candidates: int = 64,
                 score_thresh: float = 0.05):
        super().__init__()
        self.backbone = Backbone()
        self.proposal_generator = ProposalGenerator()
        self.roi_heads = ROIHeads()
        self.max_det = max_det
        self.pre_nms_topk = pre_nms_topk
        self.post_nms_topk = post_nms_topk
        self.box_candidates = box_candidates
        self.score_thresh = score_thresh

    @torch.no_grad()
    def forward(self, image_bgr_chw: torch.Tensor, true_h: float, true_w: float):
        pyramid = self.backbone(image_bgr_chw[None])
        logits, deltas = self.proposal_generator.rpn_head(pyramid)

        all_boxes, all_scores, all_lvls = [], [], []
        for li, (lg, dl) in enumerate(zip(logits, deltas)):
            stride = 2 ** (li + 2)
            hl, wl = lg.shape[2], lg.shape[3]
            anch = anchors_for_level_t(hl, wl, stride, ANCHOR_SIZES[li])
            scores_l = lg.permute(0, 2, 3, 1).reshape(-1)
            deltas_l = dl.permute(0, 2, 3, 1).reshape(-1, 4)
            k = min(self.pre_nms_topk, len(scores_l))
            top_s, top_i = torch.topk(scores_l, k)
            boxes_l = clip_boxes_t(decode_boxes_t(anch[top_i], deltas_l[top_i]),
                                   true_h, true_w)
            all_boxes.append(boxes_l)
            all_scores.append(top_s)
            all_lvls.append(torch.full((k,), float(li)))
        boxes = torch.cat(all_boxes)
        scores = torch.cat(all_scores)
        lvls = torch.cat(all_lvls)
        keep, valid = nms_t(boxes + lvls[:, None] * (MAX_SIZE_TEST * 2.0),
                            scores, RPN_NMS_THRESH, self.post_nms_topk)
        proposals = boxes[keep] * valid[:, None]

        pooled = multilevel_roi_align_t(pyramid, proposals, 7)
        x = self.roi_heads.box_head(pooled)
        cls_logits = self.roi_heads.box_predictor.cls_score(x)
        box_deltas = self.roi_heads.box_predictor.bbox_pred(x)
        probs = F.softmax(cls_logits, dim=-1)[:, :NUM_CLASSES]

        r = len(proposals)
        det_boxes = torch.stack([
            decode_boxes_t(proposals[i][None].expand(NUM_CLASSES, 4),
                           box_deltas[i].reshape(NUM_CLASSES, 4), BOX_REG_WEIGHTS)
            for i in range(r)
        ])  # (R, C, 4)

        flat_scores = (probs * valid[:, None]).reshape(-1)
        flat_scores = torch.where(flat_scores >= self.score_thresh, flat_scores,
                                  torch.tensor(0.0))
        flat_boxes = det_boxes.reshape(-1, 4)
        flat_cls = torch.arange(NUM_CLASSES).repeat(r)

        cand = min(self.box_candidates, len(flat_scores))
        cs, ci = torch.topk(flat_scores, cand)
        cboxes = clip_boxes_t(flat_boxes[ci], true_h, true_w)
        ccls = flat_cls[ci]
        keep2, valid2 = nms_t(cboxes + ccls[:, None].float() * (MAX_SIZE_TEST * 2.0),
                              cs, ROI_NMS_THRESH, self.max_det)
        valid2 = valid2 & (cs[keep2] > 0)
        final_boxes = cboxes[keep2]
        final_scores = cs[keep2] * valid2
        final_cls = ccls[keep2]

        mpooled = multilevel_roi_align_t(pyramid, final_boxes, 14)
        mlogits = self.roi_heads.mask_head(mpooled)
        masks28 = torch.sigmoid(
            mlogits[torch.arange(self.max_det), final_cls]
        )
        return final_boxes, final_scores, final_cls, masks28, valid2


def random_twin(seed: int = 0, **kw) -> MaskRCNNTwin:
    """A twin with random weights AND random (positive-variance) frozen-BN
    stats — shapes identical to a real detectron2 checkpoint."""
    torch.manual_seed(seed)
    twin = MaskRCNNTwin(**kw)
    sd = twin.state_dict()
    for k, v in sd.items():
        if k.endswith("running_var"):
            sd[k] = torch.rand_like(v) * 0.5 + 0.5
        elif k.endswith("running_mean"):
            sd[k] = torch.randn_like(v) * 0.1
    twin.load_state_dict(sd)
    return twin
