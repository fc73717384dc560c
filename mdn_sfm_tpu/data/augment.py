"""Fused on-device augmentation (reference: datasets/custom_transforms.py:9-113,
datasets/mono_dataset.py:73-127).

Everything here runs inside the jitted train step on uint8 batches shipped
from the host: static shapes, per-sample RNG, one fused XLA program.

Reference-semantics notes:
* ColorJitter is a NO-OP as shipped — theta=1 forces all jitter params to 0
  (custom_transforms.py:83-94). Real jitter is available behind
  ``enable_color_jitter`` (a deliberate fix, SURVEY.md §2 C6).
* RandomHorizontalFlip p=0.5 adjusts cx ← W − cx (custom_transforms.py:39-40;
  the reference uses W, not W−1 — preserved).
* RandomScaleCrop zooms up to 15% then crops back, adjusting K
  (custom_transforms.py:43-69). The reference resizes to a dynamic integer
  size then crops; here the resize+crop collapses into one gather-bilinear
  with continuous scales/offsets — statistically equivalent, static shapes.
* Normalize mean 0.45 / std 0.225 (mono_dataset.py:51-52).
* Scales 1..3 are bilinear downsamples of the augmented scale-0 image with
  K/2ˢ (mono_dataset.py:115-125).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from ..config import Config
from ..geometry import invert_intrinsics

Array = jax.Array

MEAN = 0.45
STD = 0.225


def _rgb_to_gray(x: Array) -> Array:
    return (
        0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]
    )


def _color_jitter(colors: Array, sample_keys: Array) -> Array:
    """Brightness/contrast/saturation jitter with the reference's ranges
    (custom_transforms.py:84-87), shared across the 3 frames of a sample like
    torchvision ColorJitter applied per __getitem__ call. Hue is skipped
    (small range, costly RGB↔HSV on device)."""

    def draw(tag, lo, hi):
        return jax.vmap(
            lambda k: jax.random.uniform(jax.random.fold_in(k, tag), (), minval=lo, maxval=hi)
        )(sample_keys)[:, None, None, None, None]

    brightness = draw(3, 0.9, 1.1)
    contrast = draw(4, 0.85, 1.15)
    saturation = draw(5, 0.85, 1.15)

    x = colors * brightness
    mean = jnp.mean(_rgb_to_gray(x), axis=(-3, -2), keepdims=True)
    x = (x - mean) * contrast + mean
    gray = _rgb_to_gray(x)
    x = (x - gray) * saturation + gray
    return jnp.clip(x, 0.0, 1.0)


def _interp_matrix(n: int, coords: Array) -> Array:
    """Per-sample 1-D linear-interpolation matrix.

    Args:
        n: input length.
        coords: (B, n_out) continuous input coordinates per output index.
    Returns:
        (B, n_out, n) weights W with out = W @ in (border clamped).

    This is the MXU-friendly form of the zoom-crop resample: a separable
    bilinear warp is two tiny batched matmuls instead of a 2-D gather (which
    is what dominates the step time on TPU — gathers don't vectorize).
    """
    x0 = jnp.floor(coords)
    f = coords - x0
    i0 = jnp.clip(x0.astype(jnp.int32), 0, n - 1)
    i1 = jnp.clip(x0.astype(jnp.int32) + 1, 0, n - 1)
    eye = jnp.eye(n, dtype=jnp.float32)
    return eye[i0] * (1.0 - f)[..., None] + eye[i1] * f[..., None]


def _resize_half(x: Array) -> Array:
    """Bilinear ×½ downsample on NHWC (torchvision Resize analog for the
    pyramid, mono_dataset.py:122-125). An exact ×½ bilinear resample without
    antialiasing samples each output at the midpoint of an input pixel pair,
    i.e. a 2×2 box average — one fused reduce_window instead of a gather."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


def augment_batch(
    cfg: Config,
    colors_u8: Array,
    K: Array,
    rng: Array,
    train: bool = True,
    enable_color_jitter: bool = False,
    sample_offset: Array | int = 0,
) -> tuple[dict, dict]:
    """Apply the full augmentation + pyramid pipeline on device.

    Args:
        cfg: static config.
        colors_u8: (B, F, H, W, 3) uint8 frames at base resolution, frame
            order == cfg.frame_ids (target first).
        K: (B, 4, 4) intrinsics already rescaled to (W, H)
            (reference: datasets/kitti_dataset.py:44-57).
        rng: PRNG key for this step.
        train: apply random flip/zoom-crop (False = eval normalization only).
        enable_color_jitter: real jitter (the reference's is a no-op).
        sample_offset: global index of this batch's first sample. Every
            random draw derives from ``fold_in(rng, sample_offset + i)`` —
            position-stable, so a shard_map'd step processing the batch's
            [offset, offset+B) slice reproduces exactly the draws the full
            batch would see on one device (training.make_train_step).
    Returns:
        (colors, inv_Ks, raw0):
          colors: {(frame_id, scale): (B, Hs, Ws, 3) normalized float32}
          inv_Ks: {scale: (B, 4, 4)}
          raw0: (B, H, W, 3) unnormalized [0,1] scale-0 target, for
            visualization parity (instance_img analog, mono_dataset.py:111).
    """
    b, f, h, w, _ = colors_u8.shape
    assert f == len(cfg.frame_ids)
    x = colors_u8.astype(jnp.float32) / 255.0  # (B, F, H, W, 3)
    K = K.astype(jnp.float32)

    if train and not cfg.disable_augment:
        # Per-sample keys from the sample's GLOBAL batch position — the
        # stream is invariant to how the batch is split across devices
        # (see the sample_offset arg doc).
        sample_keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
            sample_offset + jnp.arange(b)
        )

        def draw(tag, fn):
            return jax.vmap(lambda k: fn(jax.random.fold_in(k, tag)))(sample_keys)

        if enable_color_jitter:
            x = _color_jitter(x, sample_keys)

        # ---- random horizontal flip (per sample): folded into the x-axis
        # resample below (no extra image pass); cx ← W − cx
        # (custom_transforms.py:39-40)
        flip = draw(0, lambda k: jax.random.bernoulli(k, 0.5))
        cx = jnp.where(flip, w - K[:, 0, 2], K[:, 0, 2])
        K = K.at[:, 0, 2].set(cx)

        # ---- random scale-crop (per sample, zoom ≤ 1.15): output pixel
        # (i, j) samples the (flipped) input at ((j+ox+.5)/sx−.5,
        # (i+oy+.5)/sy−.5) — the fusion of resize-to-(h·sy, w·sx) + crop.
        # The warp is separable, so it runs as two batched matmuls.
        scale_xy = draw(1, lambda k: jax.random.uniform(k, (2,), minval=1.0, maxval=1.15))
        max_off = jnp.stack(
            [w * scale_xy[:, 0] - w, h * scale_xy[:, 1] - h], axis=-1
        )  # (B, 2)
        offset_xy = draw(2, lambda k: jax.random.uniform(k, (2,))) * max_off

        in_x = (jnp.arange(w)[None] + offset_xy[:, 0:1] + 0.5) / scale_xy[:, 0:1] - 0.5
        in_y = (jnp.arange(h)[None] + offset_xy[:, 1:2] + 0.5) / scale_xy[:, 1:2] - 0.5
        in_x = jnp.where(flip[:, None], (w - 1) - in_x, in_x)  # fold the flip
        Wx = _interp_matrix(w, in_x)  # (B, W, W)
        Wy = _interp_matrix(h, in_y)  # (B, H, H)

        # default (bf16 MXU) precision: ~4e-3 pixel error, invisible to the
        # bf16 conv stack that consumes these images
        x = jnp.einsum("bih,bfhwc->bfiwc", Wy, x)
        x = jnp.einsum("bjw,bfiwc->bfijc", Wx, x)

        # K update (custom_transforms.py:66-69)
        K = K.at[:, 0, :].multiply(scale_xy[:, 0:1])
        K = K.at[:, 1, :].multiply(scale_xy[:, 1:2])
        K = K.at[:, 0, 2].add(-offset_xy[:, 0])
        K = K.at[:, 1, 2].add(-offset_xy[:, 1])

    colors: dict = {}
    raw0 = x[:, 0]
    normalized = (x - MEAN) / STD

    inv_Ks: dict = {}
    num_scales = max(cfg.scales) + 1
    per_scale = [normalized]
    for s in range(1, num_scales):
        prev = per_scale[-1]
        _, _, hs, ws, c = prev.shape
        down = _resize_half(prev.reshape(b * f, hs, ws, c))
        per_scale.append(down.reshape(b, f, hs // 2, ws // 2, c))

    for s in range(num_scales):
        Ks = K.at[:, 0, :].multiply(1.0 / 2**s).at[:, 1, :].multiply(1.0 / 2**s) if s else K
        inv_Ks[s] = invert_intrinsics(Ks)
        for fi, frame_id in enumerate(cfg.frame_ids):
            colors[(frame_id, s)] = per_scale[s][:, fi]

    return colors, inv_Ks, raw0


def eval_preprocess(colors_u8: Array) -> Array:
    """Normalize eval images: /255, mean 0.45, std 0.225
    (reference: datasets/kitti_dataset.py:93-97)."""
    return (colors_u8.astype(jnp.float32) / 255.0 - MEAN) / STD
