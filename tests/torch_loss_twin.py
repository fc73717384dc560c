"""Independent PyTorch twin of the loss stack, built from the reference's
published equations (loss_functions.py:11-205, loss_utils.py:39-202,
utils.py:355-379, networks/layers.py:101-178 as SPEC — re-derived, not
copied), used to cross-check ``mdn_sfm_tpu.losses.compute_losses``.

Everything here is NCHW torch.float64 so that any disagreement with the JAX
f32 implementation is the JAX side's rounding, not the twin's.

Interface contract mirrored from ``compute_losses``:
  * flows arrive NORMALIZED and are multiplied by [W, H] per scale
  * the epipolar residual is |(F p1) · p2| / (sqrt(‖(Fp1)₁₂‖² + 1e-10) + 1e-10)
  * per-scale terms divide by 2**scale; with min-fusion the smooth term is
    accumulated once per reference frame with the same fused mask (the
    double-count quirk); total = w_e·epip + w_s·smooth + w_c·consis
    [+ w_p·photo when enabled]
"""

from __future__ import annotations

import math
from types import SimpleNamespace

import numpy as np
import torch
import torch.nn.functional as F

DT = torch.float64


def _t(x) -> torch.Tensor:
    return torch.as_tensor(np.asarray(x), dtype=DT)


def _nchw(x) -> torch.Tensor:
    """NHWC numpy → NCHW f64 tensor (accepts (B,H,W) too → (B,1,H,W))."""
    t = _t(x)
    if t.ndim == 3:
        t = t[:, None]
    else:
        t = t.permute(0, 3, 1, 2)
    return t


# ------------------------------------------------------------- primitives


def epipolar_map_t(flow_px: torch.Tensor, inv_K: torch.Tensor,
                   rotation: torch.Tensor, translation: torch.Tensor) -> torch.Tensor:
    """|signed residual| via the (B,3,H·W) matmul formulation — deliberately
    the MATERIALIZED pipeline (homogeneous p1/p2 tensors, batched matmuls),
    i.e. a different computation path from the JAX fused-elementwise version.

    flow_px: (B, 2, H, W) pixel flow. Returns (B, 1, H, W)."""
    b, _, h, w = flow_px.shape
    xs, ys = np.meshgrid(range(w), range(h), indexing="xy")
    coords = torch.stack([_t(xs), _t(ys)])[None].expand(b, 2, h, w)
    ones = torch.ones((b, 1, h, w), dtype=DT)
    p1 = torch.cat([coords, ones], 1).reshape(b, 3, -1)
    p2 = torch.cat([coords + flow_px, ones], 1).reshape(b, 3, -1)

    tx = torch.zeros((b, 3, 3), dtype=DT)
    tx[:, 0, 1], tx[:, 0, 2] = -translation[:, 2], translation[:, 1]
    tx[:, 1, 0], tx[:, 1, 2] = translation[:, 2], -translation[:, 0]
    tx[:, 2, 0], tx[:, 2, 1] = -translation[:, 1], translation[:, 0]

    Fm = inv_K.transpose(-2, -1) @ (tx @ rotation) @ inv_K  # (B, 3, 3)
    Fp1 = Fm @ p1                                           # (B, 3, HW)
    num = (Fp1 * p2).sum(1, keepdim=True)
    den = (Fp1[:, :2].pow(2).sum(1, keepdim=True) + 1e-10).sqrt() + 1e-10
    return (num / den).reshape(b, 1, h, w).abs()


def post_epipolar_t(mode: str, emap: torch.Tensor, threshold=None,
                    gauss=None, instance_mask=None):
    """Per-mode post-processing → (post, ori). SN/DC: divide by per-image max
    then square, with the in-place aliasing quirk (ori is the NORMALIZED
    map). T: (map/threshold)². TG: (map/threshold/gauss)². DS: resized
    union-mask × map."""
    if mode in ("SN", "DC"):
        norms = emap.reshape(emap.shape[0], -1).max(1).values[:, None, None, None]
        normalized = emap / norms
        return normalized ** 2, normalized
    if mode == "T":
        return (emap / threshold) ** 2, emap
    if mode == "TG":
        post = emap / threshold if threshold is not None else emap
        return (post / gauss[None, None]) ** 2, emap
    if mode == "DS":
        m = F.interpolate(instance_mask, size=emap.shape[-2:], mode="bilinear",
                          align_corners=False)
        return m * emap, emap
    raise ValueError(mode)


def smooth_loss_t(target: torch.Tensor, mobile: torch.Tensor) -> torch.Tensor:
    gx = (target[..., :-1] - target[..., 1:]).abs().mean(1, keepdim=True)
    gy = (target[..., :-1, :] - target[..., 1:, :]).abs().mean(1, keepdim=True)
    mx = (mobile[..., :-1] - mobile[..., 1:]).abs()
    my = (mobile[..., :-1, :] - mobile[..., 1:, :]).abs()
    return (mx * torch.exp(-gx)).mean() + (my * torch.exp(-gy)).mean()


def consistency_t(m1: torch.Tensor, m2: torch.Tensor, thr=0.5) -> torch.Tensor:
    a1 = torch.sigmoid(20.0 * (m1 - thr))
    a2 = torch.sigmoid(20.0 * (m2 - thr))
    return ((a1 - a2) ** 2).mean()


def bce_t(mobile: torch.Tensor, instance_mask: torch.Tensor) -> torch.Tensor:
    m = F.interpolate(instance_mask, size=mobile.shape[-2:], mode="bilinear",
                      align_corners=False)
    return (-(m * torch.log(mobile + 1e-10)
              + (1 - m) * torch.log(1 - mobile + 1e-10))).mean()


def ssim_t(x: torch.Tensor, y: torch.Tensor) -> torch.Tensor:
    """(1 − SSIM)/2 with 3×3 mean pooling over reflection-padded inputs."""
    pad = torch.nn.ReflectionPad2d(1)
    pool = lambda t: F.avg_pool2d(pad(t), 3, 1)
    mx, my = pool(x), pool(y)
    sx = pool(x * x) - mx ** 2
    sy = pool(y * y) - my ** 2
    sxy = pool(x * y) - mx * my
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    n = (2 * mx * my + c1) * (2 * sxy + c2)
    d = (mx ** 2 + my ** 2 + c1) * (sx + sy + c2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def photometric_t(target: torch.Tensor, reference: torch.Tensor,
                  flow_px: torch.Tensor, use_ssim: bool) -> torch.Tensor:
    b, _, h, w = reference.shape
    xs, ys = np.meshgrid(range(w), range(h), indexing="xy")
    x = _t(xs)[None] + flow_px[:, 0]
    y = _t(ys)[None] + flow_px[:, 1]
    gx = 2.0 * x / (w - 1) - 1.0
    gy = 2.0 * y / (h - 1) - 1.0
    grid = torch.stack([gx, gy], -1)
    warped = F.grid_sample(reference, grid.to(reference.dtype), mode="bilinear",
                           padding_mode="zeros", align_corners=True)
    valid = (torch.maximum(gx.abs(), gy.abs()) <= 1.0).to(DT)[:, None]
    loss = ((target - warped).abs() * valid).mean()
    if use_ssim:
        loss = 0.15 * loss + 0.85 * ssim_t(target, warped).mean()
    return loss


def gauss_weight_t(height: int, width: int, scale: int,
                   sigma1: float, sigma2: float) -> torch.Tensor:
    """Anisotropic center-weight map at one scale (ρ = 0), the reference's
    double loop (utils.py:355-379): dist = 2e5·(max − gauss) + 5."""
    num = 2 ** scale
    h, w = height // num, width // num
    g = np.zeros((h, w))
    xc, yc = h // 2, w // 2
    for i in range(h):
        for j in range(w):
            a = (i - xc) ** 2 / (sigma1 / num) ** 2
            b = (j - yc) ** 2 / (sigma2 / num) ** 2
            factor = 1.0 / (2 * math.pi * sigma1 * sigma2)
            g[i, j] = factor * math.exp(-(a + b) / 2)
    return _t(2e5 * (g.max() - g) + 5.0)


# ------------------------------------------------------------ orchestration


def loss_twin(
    opts: SimpleNamespace,
    colors: dict,
    inv_Ks: dict,
    flows: dict,
    mobiles: dict,
    cam_T_cams: dict,
    instance_mask=None,
) -> dict:
    """Full multi-scale multi-frame loss; numpy-NHWC inputs keyed exactly
    like ``compute_losses``. ``opts`` fields: mode, scales, frame_ids,
    threshold, alpha, w_e/w_s/w_c/w_p, bce_weight (0 = no BCE term),
    gauss_sigma1/2, height, width, disable_min, disable_smoothloss,
    disable_consisloss, use_photo, no_ssim. Returns float python scalars."""
    losses = {"epip": 0.0, "smooth": 0.0, "consis": 0.0}
    if opts.use_photo:
        losses["photo"] = 0.0
    mask_t = _nchw(instance_mask) if instance_mask is not None else None

    for s in opts.scales:
        avg = 2 ** s
        tgt = _nchw(colors[(0, s)])
        h, w = tgt.shape[-2:]
        gauss = (
            gauss_weight_t(opts.height, opts.width, s, opts.gauss_sigma1, opts.gauss_sigma2)
            if opts.mode == "TG" else None
        )

        m1 = _nchw(mobiles[(opts.frame_ids[0], s)])
        m2 = _nchw(mobiles[(opts.frame_ids[1], s)])
        min_mobile = torch.minimum(m1, m2)

        if not opts.disable_consisloss:
            losses["consis"] += (consistency_t(m1, m2) / avg).item()

        for i in opts.frame_ids:
            mobile = _nchw(mobiles[(i, s)]) if opts.disable_min else min_mobile
            fl = _nchw(flows[(i, s)])
            flow_px = torch.stack([fl[:, 0] * w, fl[:, 1] * h], 1)

            if not opts.disable_smoothloss:
                losses["smooth"] += (smooth_loss_t(tgt, mobile) / avg).item()

            if opts.use_photo:
                ref = _nchw(colors[(i, s)])
                losses["photo"] += (
                    photometric_t(tgt, ref, flow_px, use_ssim=not opts.no_ssim) / avg
                ).item()

            T = _t(cam_T_cams[i])
            emap = epipolar_map_t(flow_px, _t(inv_Ks[s])[:, :3, :3],
                                  T[:, :3, :3], T[:, :3, 3])
            post, _ = post_epipolar_t(opts.mode, emap, threshold=opts.threshold,
                                      gauss=gauss, instance_mask=mask_t)
            background = 1 - mobile
            frame_loss = (background * post).mean() \
                + opts.alpha * (mobile * torch.log(background + 1e-5)).abs().mean()
            if opts.bce_weight > 0:
                frame_loss = frame_loss + opts.bce_weight * bce_t(mobile, mask_t)
            losses["epip"] += (frame_loss / avg).item()

    losses["loss"] = (opts.w_e * losses["epip"] + opts.w_s * losses["smooth"]
                      + opts.w_c * losses["consis"])
    if opts.use_photo:
        losses["loss"] += opts.w_p * losses["photo"]
    return losses
