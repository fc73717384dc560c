"""Pure-JAX SE(3) and epipolar geometry.

TPU-native reimplementation of the reference's geometry helpers
(reference: networks/layers.py:16-103, loss_utils.py:12-69,141-148,
utils.py:289-315,355-379). All functions are pure, jit-safe, static-shape,
and use NHWC image layout; pixel coordinates are (x=column, y=row), matching
the reference's ``meshgrid(range(W), range(H), indexing='xy')``
(loss_utils.py:141-148).

Everything here runs in float32 regardless of the conv compute dtype — these
are the scientific numerics of the pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ----------------------------------------------------------------- rotations


def rot_from_axisangle(vec: Array) -> Array:
    """Axis-angle (B, 3) → rotation matrix (B, 3, 3) via Rodrigues' formula.

    Matches the reference's Rodrigues expansion including its 1e-7 axis
    regularizer (reference: networks/layers.py:59-98; returns the 3×3 block
    of its 4×4 output).
    """
    vec = vec.astype(jnp.float32)
    # Gradient-safe angle: the naive norm's gradient at vec = 0 is 0/0 = NaN
    # (torch has the same hole, but the reference never trains pose, so it
    # never bites there; with fine_tune_flow_motion a head emitting an exact
    # zero would poison EVERY parameter through global grad-clipping).
    # sqrt(Σv² + 1e-14) keeps the f32 forward bitwise identical at 0
    # (cos(1e-7) rounds to 1.0f, sin(1e-7)·axis = 0) and within one ulp
    # elsewhere, with a finite (zero) gradient at the origin.
    angle = jnp.sqrt(jnp.sum(vec * vec, axis=-1, keepdims=True) + 1e-14)  # (B, 1)
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., None]  # (B, 1, 1)
    sa = jnp.sin(angle)[..., None]
    C = 1.0 - ca

    x = axis[..., 0:1, None]
    y = axis[..., 1:2, None]
    z = axis[..., 2:3, None]

    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    row0 = jnp.concatenate([x * xC + ca, xyC - zs, zxC + ys], axis=-1)
    row1 = jnp.concatenate([xyC + zs, y * yC + ca, yzC - xs], axis=-1)
    row2 = jnp.concatenate([zxC - ys, yzC + xs, z * zC + ca], axis=-1)
    return jnp.concatenate([row0, row1, row2], axis=-2)  # (B, 3, 3)


def transformation_from_parameters(
    axisangle: Array, translation: Array, invert: bool = False
) -> Array:
    """(axis-angle, translation) → 4×4 extrinsic matrix, batched.

    Args:
        axisangle:   (B, 1, 1, 3) or (B, 3)
        translation: (B, 1, 1, 3) or (B, 3)
        invert:      if True, returns R⁻¹ · T(-t) instead of T(t) · R
                     (reference: networks/layers.py:16-40)
    Returns:
        (B, 4, 4)
    """
    aa = axisangle.reshape(axisangle.shape[0], 3)
    t = translation.reshape(translation.shape[0], 3).astype(jnp.float32)

    R3 = rot_from_axisangle(aa)  # (B, 3, 3)
    if invert:
        R3 = jnp.swapaxes(R3, -1, -2)
        # (R · T(-t)) last column = R3 · (-t); keep full f32 precision — on
        # TPU a plain matmul would round through bf16 on the MXU.
        tcol = jnp.einsum("bij,bj->bi", R3, -t, precision=jax.lax.Precision.HIGHEST)
    else:
        # (T(t) · R) last column = t
        tcol = t

    b = R3.shape[0]
    M = jnp.zeros((b, 4, 4), jnp.float32)
    M = M.at[:, :3, :3].set(R3).at[:, :3, 3].set(tcol).at[:, 3, 3].set(1.0)
    return M


# ------------------------------------------------------------- pixel grids


@functools.lru_cache(maxsize=64)
def _pixel_coords_np(height: int, width: int) -> np.ndarray:
    xs, ys = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    return np.stack([xs, ys], axis=-1).astype(np.float32)  # (H, W, 2)


def pixel_coords(height: int, width: int) -> Array:
    """(H, W, 2) grid of (x, y) pixel coordinates.

    NHWC analog of the reference's ``create_coords`` (loss_utils.py:141-148).
    """
    return jnp.asarray(_pixel_coords_np(height, width))


def scale_factor(height: int, width: int) -> Array:
    """(2,) = [W, H]: converts the networks' normalized flow to pixel flow
    (reference: networks/layers.py:101-103)."""
    return jnp.array([width, height], jnp.float32)


# ----------------------------------------------------------- epipolar maps


def skew(t: Array) -> Array:
    """Skew-symmetric cross-product matrix of t (B, 3) → (B, 3, 3)
    (reference: loss_utils.py:50-56)."""
    z = jnp.zeros_like(t[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -t[..., 2], t[..., 1]], axis=-1),
            jnp.stack([t[..., 2], z, -t[..., 0]], axis=-1),
            jnp.stack([-t[..., 1], t[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def fundamental_matrix(inv_K: Array, rotation: Array, translation: Array) -> Array:
    """F = inv_Kᵀ · [t]ₓ · R · inv_K, batched (reference: loss_utils.py:61-62).

    Args:
        inv_K:       (B, 3, 3) inverse intrinsics
        rotation:    (B, 3, 3)
        translation: (B, 3)
    """
    # 3×3 chained matmuls in full f32 — on TPU the default matmul precision
    # rounds through bf16 on the MXU, which is too coarse for the epipolar
    # numerics (these are B×3×3, so HIGHEST costs nothing).
    hi = jax.lax.Precision.HIGHEST
    E = jnp.matmul(
        skew(translation.astype(jnp.float32)), rotation.astype(jnp.float32), precision=hi
    )
    inv_K = inv_K.astype(jnp.float32)
    return jnp.matmul(
        jnp.swapaxes(inv_K, -1, -2), jnp.matmul(E, inv_K, precision=hi), precision=hi
    )


def epipolar_residual(
    flow: Array, inv_K: Array, rotation: Array, translation: Array
) -> Array:
    """Per-pixel signed epipolar residual (Sampson-style distance to the
    epipolar line).

    Fused NHWC equivalent of the reference pipeline that materializes
    homogeneous coordinate tensors p1/p2 of shape (B, 3, H·W) and calls
    ``get_epipolar_new`` (reference: loss_functions.py:117-123 +
    loss_utils.py:39-69). Here the coordinate grid is generated on the fly
    and the 3-vector algebra stays fused elementwise — no (B, 3, H·W)
    intermediates in HBM.

    Args:
        flow:        (B, H, W, 2) optical flow in PIXELS (already multiplied
                     by ``scale_factor``; the nets emit normalized flow)
        inv_K:       (B, 3, 3) or (B, 4, 4) (the 3×3 block is used)
        rotation:    (B, 3, 3) cam_T_cam rotation block
        translation: (B, 3) cam_T_cam translation column
    Returns:
        (B, H, W) signed residual; callers take ``abs`` like the reference
        (loss_functions.py:123).
    """
    _, h, w, _ = flow.shape
    F = fundamental_matrix(inv_K[..., :3, :3], rotation, translation)  # (B,3,3)

    pc = pixel_coords(h, w)  # (H, W, 2)
    x1, y1 = pc[..., 0], pc[..., 1]

    flow = flow.astype(jnp.float32)
    x2 = x1[None] + flow[..., 0]  # (B, H, W)
    y2 = y1[None] + flow[..., 1]

    # Fp1 where p1 = (x1, y1, 1): expand the matmul into 3 fused FMAs so XLA
    # keeps everything elementwise on the VPU (F entries broadcast as scalars).
    def Fi(i: int) -> Array:
        return (
            F[:, i, 0, None, None] * x1[None]
            + F[:, i, 1, None, None] * y1[None]
            + F[:, i, 2, None, None]
        )

    f0, f1, f2 = Fi(0), Fi(1), Fi(2)
    num = f0 * x2 + f1 * y2 + f2  # (Fp1)·p2
    den = jnp.sqrt(f0 * f0 + f1 * f1 + 1e-10) + 1e-10
    return num / den


def invert_intrinsics(K: Array) -> Array:
    """Closed-form inverse of a batched 4×4 (or 3×3) intrinsics matrix.

    The reference calls ``torch.linalg.pinv`` on the 4×4 K
    (datasets/mono_dataset.py:113,121); K is block-diagonal
    [[K₃, 0], [0, 1]] with upper-triangular K₃ = [[fx, s, cx], [0, fy, cy],
    [0, 0, 1]], so the inverse is analytic — no linear solve on the TPU.

    Args:
        K: (..., 4, 4) or (..., 3, 3)
    Returns:
        same shape, the inverse.
    """
    K = K.astype(jnp.float32)
    fx = K[..., 0, 0]
    sk = K[..., 0, 1]
    cx = K[..., 0, 2]
    fy = K[..., 1, 1]
    cy = K[..., 1, 2]

    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    inv_fx = 1.0 / fx
    inv_fy = 1.0 / fy

    r0 = jnp.stack([inv_fx, -sk * inv_fx * inv_fy, (sk * cy - cx * fy) * inv_fx * inv_fy], -1)
    r1 = jnp.stack([zeros, inv_fy, -cy * inv_fy], -1)
    r2 = jnp.stack([zeros, zeros, ones], -1)
    inv3 = jnp.stack([r0, r1, r2], -2)

    if K.shape[-1] == 3:
        return inv3
    out = jnp.zeros_like(K)
    out = out.at[..., :3, :3].set(inv3).at[..., 3, 3].set(1.0)
    return out


# ----------------------------------------------------- sampling and warping


def bilinear_sample(img: Array, coords: Array, padding_mode: str = "zeros") -> Array:
    """Bilinear sampling — JAX equivalent of ``F.grid_sample`` with
    align_corners=True on absolute pixel coordinates.

    Args:
        img:    (B, H, W, C)
        coords: (B, H', W', 2) absolute (x, y) sample positions in pixels
        padding_mode: "zeros" (out-of-bounds taps contribute 0) or "border"
    Returns:
        (B, H', W', C)
    """
    _, h, w, _ = img.shape
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi: Array, yi: Array) -> tuple[Array, Array]:
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jax.vmap(lambda im, yy, xx: im[yy, xx])(img, yc, xc)  # (B,H',W',C)
        if padding_mode == "zeros":
            vals = vals * valid[..., None]
        return vals, valid

    v00, _ = tap(x0, y0)
    v01, _ = tap(x0 + 1, y0)
    v10, _ = tap(x0, y0 + 1)
    v11, _ = tap(x0 + 1, y0 + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def inverse_warp(ref_img: Array, flow: Array, padding_mode: str = "zeros") -> tuple[Array, Array]:
    """Warp the reference image to the target plane along the flow.

    JAX equivalent of the reference's ``inverse_warp``
    (loss_utils.py:12-36): sample ``ref_img`` at (pix + flow) and flag
    samples whose normalized grid coordinate lies in [-1, 1].

    Args:
        ref_img: (B, H, W, C)
        flow:    (B, H, W, 2) pixel flow
    Returns:
        (warped (B, H, W, C), valid (B, H, W, 1) float mask)
    """
    _, h, w, _ = ref_img.shape
    coords = pixel_coords(h, w)[None] + flow.astype(jnp.float32)
    warped = bilinear_sample(ref_img, coords, padding_mode)
    gx = 2.0 * coords[..., 0] / (w - 1) - 1.0
    gy = 2.0 * coords[..., 1] / (h - 1) - 1.0
    valid = (jnp.maximum(jnp.abs(gx), jnp.abs(gy)) <= 1.0).astype(ref_img.dtype)
    return warped, valid[..., None]


# -------------------------------------------------------------- resampling


def _resize_matrix(src: int, dst: int) -> Array:
    """(dst, src) interpolation weights of torch
    ``F.interpolate(mode='bilinear', align_corners=False, antialias=False)``:
    half-pixel source coords, 2-tap bilinear, edge-clamped."""
    x = jnp.clip((jnp.arange(dst) + 0.5) * (src / dst) - 0.5, 0.0, src - 1.0)
    lo = jnp.floor(x).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, src - 1)
    f = (x - lo).astype(jnp.float32)
    m = jnp.zeros((dst, src), jnp.float32)
    m = m.at[jnp.arange(dst), lo].add(1.0 - f)
    return m.at[jnp.arange(dst), hi].add(f)


def resize_bilinear(img: Array, height: int, width: int) -> Array:
    """Bilinear resize on NHWC (or HWC / HW) tensors — the on-device analog of
    torchvision ``Resize`` used throughout the reference loss path
    (loss_utils.py:74-75,136-137; datasets/mono_dataset.py:122-125).

    Upsampling uses ``jax.image.resize`` (2-tap kernel — identical to torch
    bilinear there). DOWNSAMPLING goes through explicit 2-tap separable
    matmuls instead, because ``jax.image.resize`` antialiases (widens the
    kernel by the scale factor) while the reference's tensor-mode
    torchvision ``Resize``/``interpolate`` does NOT — up to 0.3 difference
    at 4× downsample on the DS/DC instance-mask path."""
    shape = list(img.shape)
    if img.ndim == 2:
        src_h, src_w = shape
    else:
        src_h, src_w = shape[-3], shape[-2]
    if height >= src_h and width >= src_w:
        if img.ndim == 2:
            return jax.image.resize(img, (height, width), method="linear")
        if img.ndim == 3:
            return jax.image.resize(img, (height, width, shape[-1]), method="linear")
        return jax.image.resize(
            img, tuple(shape[:-3]) + (height, width, shape[-1]), method="linear"
        )

    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    wy = _resize_matrix(src_h, height).astype(x.dtype)
    wx = _resize_matrix(src_w, width).astype(x.dtype)
    hi = jax.lax.Precision.HIGHEST  # 2-tap weights must not round through bf16
    y = jnp.einsum("oh,...hwc->...owc", wy, x, precision=hi)
    y = jnp.einsum("pw,...owc->...opc", wx, y, precision=hi)
    return y[..., 0] if squeeze else y


def upsample_nearest_2x(x: Array) -> Array:
    """Nearest ×2 upsample on NHWC — reference ``upsample``
    (networks/layers.py:142-145). Implemented with repeats (cheap reshapes;
    XLA lowers these to a broadcast, no gather)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


# ---------------------------------------------------------- gaussian weight


@functools.lru_cache(maxsize=32)
def _gauss_distance_weight_np(
    height: int, width: int, num: int, sigma1: float, sigma2: float
) -> np.ndarray:
    h, w = height // num, width // num
    i = np.arange(h, dtype=np.float64)[:, None]
    j = np.arange(w, dtype=np.float64)[None, :]
    x_center, y_center = h // 2, w // 2
    a = (i - x_center) ** 2 / (sigma1 / num) ** 2
    b = (j - y_center) ** 2 / (sigma2 / num) ** 2
    factor = 1.0 / (2.0 * np.pi * sigma1 * sigma2)
    gauss = factor * np.exp(-(a + b) / 2.0)
    dist = 2e5 * (gauss.max() - gauss) + 5.0
    return dist.astype(np.float32)  # (h, w)


def gauss_distance_weight(
    height: int, width: int, num_scales: int, sigma1: float = 30.0, sigma2: float = 120.0
) -> list[Array]:
    """Anisotropic center-weight maps for TG mode, one per scale.

    Vectorized port of the reference's double python loop
    (utils.py:355-379, ρ=0 so the cross term vanishes and the normalization
    factor is scale-independent). Returns a list of (H/2ˢ, W/2ˢ) arrays —
    pixels at the same relative position have the same weight across scales.
    """
    return [
        jnp.asarray(_gauss_distance_weight_np(height, width, 2**s, sigma1, sigma2))
        for s in range(num_scales)
    ]
