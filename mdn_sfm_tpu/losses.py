"""Loss core: epipolar supervision with mode-dispatched post-processing.

TPU-native reimplementation of the reference's loss stack
(reference: loss_functions.py:11-205, loss_utils.py:39-202). Everything is a
pure function over NHWC arrays, jit-safe and static-shape; the training mode
(SN/T/TG/DS/DC — README.md:5) is a static argument so each variant compiles
to its own fused XLA program.

Deliberate reproductions of reference quirks (flagged here so they are
decisions, not accidents):

* SN mode's ``post_process_epipolar_1`` normalizes the epipolar map IN PLACE,
  so the "original" map returned for logging is already max-normalized
  (loss_utils.py:92-99 + loss_functions.py:138). We reproduce that: in SN
  mode ``aux.epipolar_ori`` is the normalized (pre-square) map.
* With min-fusion enabled, the smooth loss is accumulated once per reference
  frame with the SAME min-fused mask — i.e. counted twice per scale
  (loss_functions.py:43-55 under :188).
* Per-scale terms are divided by 2**scale (loss_functions.py:55,59).
"""

from __future__ import annotations

from typing import Any, Mapping, NamedTuple

import jax
import jax.numpy as jnp

from .config import Config, Mode
from .geometry import (
    epipolar_residual,
    gauss_distance_weight,
    inverse_warp,
    resize_bilinear,
    scale_factor,
)

Array = jax.Array


# -------------------------------------------------------------- primitives


def smooth_loss(target: Array, mobile: Array) -> Array:
    """Edge-aware smoothness of the mobile map w.r.t. image gradients
    (reference: loss_utils.py:151-168).

    Args:
        target: (B, H, W, C) color image at the current scale
        mobile: (B, H, W, 1) mobile probability map
    """
    target = target.astype(jnp.float32)
    mobile = mobile.astype(jnp.float32)
    grad_img_x = jnp.mean(jnp.abs(target[:, :, :-1] - target[:, :, 1:]), -1, keepdims=True)
    grad_img_y = jnp.mean(jnp.abs(target[:, :-1] - target[:, 1:]), -1, keepdims=True)
    grad_mob_x = jnp.abs(mobile[:, :, :-1] - mobile[:, :, 1:])
    grad_mob_y = jnp.abs(mobile[:, :-1] - mobile[:, 1:])
    return jnp.mean(grad_mob_x * jnp.exp(-grad_img_x)) + jnp.mean(
        grad_mob_y * jnp.exp(-grad_img_y)
    )


def derivable_consistency_loss(m1: Array, m2: Array, threshold: float = 0.5) -> Array:
    """Soft-binarized forward/backward mask consistency
    (reference: loss_utils.py:171-177). Returns the per-pixel map."""
    a1 = jax.nn.sigmoid(20.0 * (m1.astype(jnp.float32) - threshold))
    a2 = jax.nn.sigmoid(20.0 * (m2.astype(jnp.float32) - threshold))
    return (a1 - a2) ** 2


def instance_similarity_bce(mobile: Array, instance_mask: Array) -> Array:
    """Per-pixel BCE between the mobile map and the instance-union mask — the
    DC term (reference: loss_utils.py:72-78 ``detectron2_similarity_loss``).

    Args:
        mobile:        (B, H, W, 1)
        instance_mask: (B, Hm, Wm) or (B, Hm, Wm, 1) union mask in [0, 1];
                       bilinearly resized to the mobile map's resolution like
                       the reference's torchvision Resize.
    """
    mobile = mobile.astype(jnp.float32)
    if instance_mask.ndim == 3:
        instance_mask = instance_mask[..., None]
    m = resize_bilinear(instance_mask.astype(jnp.float32), mobile.shape[1], mobile.shape[2])
    return -(m * jnp.log(mobile + 1e-10) + (1.0 - m) * jnp.log(1.0 - mobile + 1e-10))


def ssim(x: Array, y: Array) -> Array:
    """SSIM distance map with 3×3 average pooling over reflect-padded inputs
    (reference: networks/layers.py:148-178). NHWC; returns (1-SSIM)/2 clipped
    to [0, 1]."""
    x = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)), "reflect")
    y = jnp.pad(y.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)), "reflect")

    def pool(t: Array) -> Array:
        return jax.lax.reduce_window(
            t, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
        ) / 9.0

    mu_x, mu_y = pool(x), pool(y)
    sig_x = pool(x * x) - mu_x**2
    sig_y = pool(y * y) - mu_y**2
    sig_xy = pool(x * y) - mu_x * mu_y
    c1, c2 = 0.01**2, 0.03**2
    n = (2 * mu_x * mu_y + c1) * (2 * sig_xy + c2)
    d = (mu_x**2 + mu_y**2 + c1) * (sig_x + sig_y + c2)
    return jnp.clip((1.0 - n / d) / 2.0, 0.0, 1.0)


def photometric_loss(
    target: Array, reference: Array, flow: Array, use_ssim: bool, padding_mode: str = "zeros"
) -> tuple[Array, Array, Array, Array]:
    """L1 (+0.85·SSIM) photometric loss over the inverse-warped reference
    (reference: loss_functions.py:107-115 — present but disconnected in the
    shipped head; kept here flag-gated)."""
    warped, valid = inverse_warp(reference, flow, padding_mode)
    diff = jnp.abs(target.astype(jnp.float32) - warped.astype(jnp.float32)) * valid
    loss = jnp.mean(diff)
    if use_ssim:
        loss = 0.15 * loss + 0.85 * jnp.mean(ssim(target, warped))
    return loss, warped, diff, valid


def divergence(foreground: Array, feature: Array) -> Array:
    """KL-style divergence between dynamic-region feature distribution and
    its spatial mean (reference: loss_utils.py:180-194 — present but unused
    in the shipped head; kept for capability parity).

    Args:
        foreground: (B, H, W, 1) binary mobile-region mask
        feature: (B, H, W, C) intermediate feature maps
    """
    foreground = foreground.astype(jnp.float32)
    feature = feature.astype(jnp.float32)
    dynamic = foreground * feature
    center = jnp.mean(dynamic, axis=(1, 2), keepdims=True)  # (B, 1, 1, C)

    dy = jax.nn.softmax(dynamic, axis=-1)
    cd = jnp.broadcast_to(jax.nn.softmax(center, axis=-1), dy.shape)
    div = jnp.abs(dy * jnp.log(dy / cd + 1e-5))
    return jnp.sum(div) / jnp.sum(foreground)


# -------------------------------------------------- mode post-processing


def post_process_epipolar(
    mode: Mode,
    epipolar_map: Array,
    *,
    threshold: float | None = None,
    gauss_weight: Array | None = None,
    instance_mask: Array | None = None,
) -> tuple[Array, Array]:
    """Dispatch the per-mode epipolar post-processing.

    Args:
        mode: training mode. DC uses SN's post-processing (the DC-specific
              BCE term is added in :func:`epipolar_loss_terms`).
        epipolar_map: (B, H, W, 1) absolute epipolar residual.
        threshold: dataset percentile threshold for T/TG (options.py:84-87).
        gauss_weight: (H, W) center-weight map for TG (utils.py:355-379).
        instance_mask: (B, Hm, Wm) union mask for DS.
    Returns:
        (post, ori): the post-processed map and the map to log as "original".
        In SN/DC mode ``ori`` is the max-normalized map, reproducing the
        reference's in-place aliasing (loss_utils.py:92-99).
    """
    epipolar_map = epipolar_map.astype(jnp.float32)
    if mode in (Mode.SN, Mode.DC):
        # post_process_epipolar_1 (loss_utils.py:92-99)
        b = epipolar_map.shape[0]
        norms = jnp.max(epipolar_map.reshape(b, -1), axis=1).reshape(b, 1, 1, 1)
        normalized = epipolar_map / norms
        return normalized**2, normalized
    if mode == Mode.T:
        # post_pro_epipolar_weighted(threshold=...) (loss_utils.py:81-89)
        return (epipolar_map / threshold) ** 2, epipolar_map
    if mode == Mode.TG:
        post = epipolar_map
        if threshold is not None:
            post = post / threshold
        post = post / gauss_weight[None, :, :, None]
        return post**2, epipolar_map
    if mode == Mode.DS:
        # post_process_epipolar_2 (loss_utils.py:127-138): mask × map, no square
        if instance_mask is None:
            raise ValueError(
                "mode=DS requires instance masks — configure mask_provider "
                "(precomputed/maskrcnn)"
            )
        if instance_mask.ndim == 3:
            instance_mask = instance_mask[..., None]
        m = resize_bilinear(
            instance_mask.astype(jnp.float32), epipolar_map.shape[1], epipolar_map.shape[2]
        )
        return m * epipolar_map, epipolar_map
    raise ValueError(f"unknown mode {mode}")


# ------------------------------------------------------------ loss driver


class LossAux(NamedTuple):
    """Per-step side outputs for logging (reference: LossModule.outputs,
    loss_functions.py:21,61-67)."""

    epipolars: dict      # {(frame, 0): (B, H, W, 1) post-processed map}
    epipolar_ori: dict   # {(frame, 0): (B, H, W, 1) "original" map (see quirks)}
    flows: dict          # {(frame, 0): (B, H, W, 2) pixel flow}
    min_mobiles: dict    # {scale: (B, Hs, Ws, 1)}


def epipolar_loss_terms(
    cfg: Config,
    flow_px: Array,
    mobile: Array,
    inv_K: Array,
    rotation: Array,
    translation: Array,
    instance_mask: Array | None,
    gauss_weight: Array | None,
) -> tuple[Array, Array, Array]:
    """One (frame, scale) epipolar loss — reference LossModule.epipolar_loss
    (loss_functions.py:117-138).

    loss = mean(background·post) + α·mean(|mobile·log(background+1e-5)|)
           [+ w_d2_sim·mean(BCE(mobile, instance_union))]      (DC only)

    Returns (scalar loss, post map, ori map).
    """
    use_pallas = (
        cfg.use_pallas_epipolar
        and not cfg.fine_tune_flow_motion  # the map carries no grad when frozen
        and flow_px.shape[1] % 8 == 0  # clean sublane tiling
        and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from .ops import epipolar_abs_residual_pallas

        resid = epipolar_abs_residual_pallas(flow_px, inv_K, rotation, translation)[..., None]
    else:
        resid = jnp.abs(epipolar_residual(flow_px, inv_K, rotation, translation))[..., None]
    post, ori = post_process_epipolar(
        cfg.mode,
        resid,
        threshold=cfg.threshold,
        gauss_weight=gauss_weight,
        instance_mask=instance_mask,
    )

    mobile = mobile.astype(jnp.float32)
    background = 1.0 - mobile
    epip = jnp.mean(background * post)
    non_trivial = jnp.mean(jnp.abs(mobile * jnp.log(background + 1e-5)))
    loss = epip + cfg.alpha * non_trivial

    # BCE similarity term. Active for: DC (its defining term), the
    # reference's checked-in SN+DC combined head (loss_functions.py:124 and
    # :132-133 are BOTH live as shipped) — i.e. SN with w_d2_sim > 0 and a
    # mask available — and DS behind the explicit ds_similarity_term opt-in
    # (reference-DS is ambiguous: enabling post_process_epipolar_2 at
    # loss_functions.py:125 leaves the unconditional BCE add at :132-133
    # live, so both readings exist; default = pure mask×map). Never for
    # T/TG. DC without a mask fails fast instead of silently training the
    # BCE term against all-zeros (which would suppress the mobile map
    # everywhere); DS already failed fast inside post_process_epipolar.
    if cfg.mode == Mode.DC:
        if instance_mask is None:
            raise ValueError(
                "mode=DC requires instance masks — configure mask_provider "
                "(precomputed/maskrcnn); refusing to train the BCE term "
                "against an implicit all-zero mask"
            )
        loss = loss + cfg.w_d2_sim * jnp.mean(instance_similarity_bce(mobile, instance_mask))
    elif cfg.mode == Mode.SN and cfg.w_d2_sim > 0 and instance_mask is not None:
        loss = loss + cfg.w_d2_sim * jnp.mean(instance_similarity_bce(mobile, instance_mask))
    elif cfg.mode == Mode.DS and cfg.ds_similarity_term and cfg.w_d2_sim > 0:
        loss = loss + cfg.w_d2_sim * jnp.mean(instance_similarity_bce(mobile, instance_mask))

    return loss, post, ori


def compute_losses(
    cfg: Config,
    colors: Mapping[tuple[int, int], Array],
    inv_Ks: Mapping[int, Array],
    flows: Mapping[tuple[int, int], Array],
    mobiles: Mapping[tuple[int, int], Array],
    cam_T_cams: Mapping[int, Array],
    instance_mask: Array | None = None,
) -> tuple[dict[str, Array], LossAux]:
    """Full multi-scale multi-frame loss — reference Loss.forward
    (loss_functions.py:160-205) + LossModule accumulation (:27-67).

    Args:
        cfg: static config (mode, weights, flags).
        colors: {(frame_id, scale): (B, Hs, Ws, 3) normalized image}; the
            target is frame 0. Reference frames are only read when the
            photometric term is enabled.
        inv_Ks: {scale: (B, 3+, 3+) inverse intrinsics}.
        flows: {(frame_id, scale): (B, Hs, Ws, 2) NORMALIZED flow from the
               flow net; multiplied by [Ws, Hs] here
               (loss_functions.py:41-44)}.
        mobiles: {(frame_id, scale): (B, Hs, Ws, 1) sigmoid mobile maps}.
        cam_T_cams: {frame_id: (B, 4, 4)}.
        instance_mask: (B, Hm, Wm) instance-union mask in [0,1], or None.
    Returns:
        (losses dict with keys loss/epip/smooth/consis[/photo], LossAux).
    """
    frame_ids = cfg.ref_frame_ids
    gauss = (
        gauss_distance_weight(
            cfg.height, cfg.width, max(cfg.scales) + 1, cfg.gauss_sigma1, cfg.gauss_sigma2
        )
        if cfg.mode == Mode.TG
        else None
    )

    zero = jnp.zeros((), jnp.float32)
    losses = {"epip": zero, "smooth": zero, "consis": zero}
    use_photo = not cfg.disable_photoloss
    if use_photo:
        losses["photo"] = zero
    aux = LossAux({}, {}, {}, {})

    for s in cfg.scales:
        avg = float(2**s)
        tgt = colors[(0, s)]
        _, hs, ws, _ = tgt.shape
        sf = scale_factor(hs, ws)

        m1 = mobiles[(frame_ids[0], s)]
        m2 = mobiles[(frame_ids[1], s)]
        min_mobile = jnp.minimum(m1, m2)  # loss_functions.py:176-178
        aux.min_mobiles[s] = min_mobile

        if not cfg.disable_consisloss:
            losses["consis"] = losses["consis"] + jnp.mean(
                derivable_consistency_loss(m1, m2)
            ) / avg

        gw = gauss[s] if gauss is not None else None
        for i in frame_ids:
            mobile = mobiles[(i, s)] if cfg.disable_min else min_mobile
            flow_px = flows[(i, s)].astype(jnp.float32) * sf  # pixels

            if not cfg.disable_smoothloss:
                losses["smooth"] = losses["smooth"] + smooth_loss(tgt, mobile) / avg

            if use_photo:
                # flag-gated photometric term (present but disconnected in
                # the shipped reference head, loss_functions.py:48-50,107-115)
                photo, _, _, _ = photometric_loss(
                    tgt, colors[(i, s)], flow_px, use_ssim=not cfg.no_ssim
                )
                losses["photo"] = losses["photo"] + photo / avg

            T = cam_T_cams[i]
            epip_loss, post, ori = epipolar_loss_terms(
                cfg, flow_px, mobile, inv_Ks[s], T[:, :3, :3], T[:, :3, 3],
                instance_mask, gw,
            )
            losses["epip"] = losses["epip"] + epip_loss / avg

            if s == 0:
                aux.epipolars[(i, 0)] = post
                aux.epipolar_ori[(i, 0)] = ori
                aux.flows[(i, 0)] = flow_px

    losses["loss"] = (
        cfg.w_e * losses["epip"] + cfg.w_s * losses["smooth"] + cfg.w_c * losses["consis"]
    )
    if use_photo:
        losses["loss"] = losses["loss"] + cfg.w_p * losses["photo"]
    return losses, aux
