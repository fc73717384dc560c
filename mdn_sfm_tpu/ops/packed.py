"""Lane-packed convolutions for the small-channel decoder stages.

TPU vector registers are (sublane × 128-lane) tiles; a conv whose channel
count is 16-64 leaves most of the 128-lane dimension idle, and profiling
shows the decoder stages at C ∈ {16, 32, 64} dominate the train step
(mobile-decoder fwd+bwd ≈ 23 ms of a 34 ms step at 640×192 bs4 — PARITY.md).

The fix: fold a factor ``p`` of the W axis into channels, so a full-res
tensor (B, H, W, C) is processed as (B, H, W/p, p·C) — with p chosen so
p·C = 128. Packing is a FREE reshape in NHWC row-major. The 3×3 convolution
becomes a 3×3 convolution over the packed tensor with a structured
(3, 3, p·C, p·C_out) kernel built from the ordinary (3, 3, C, C_out) kernel:
output slot t reads input slot s = (t + v − 1) mod p of column-group
g = (t + v − 1) // p. The dense packed kernel carries p× redundant zeros —
irrelevant MACs on an MXU that is otherwise idle at these shapes — and the
parameter tree still stores the ordinary kernel, so checkpoints are
unchanged. Measured: 2.1× on the stage-0 conv fwd+bwd, exact to f32
round-off (tests/test_packed_ops.py).

The fused upsample×2+conv3×3 (see ops/fused.py for the parity-kernel
algebra) packs the same way: input packed by p/2, one 3×3 conv to
(2p·C_out)-channel blocks indexed (row-parity, slot), then a row interleave.

Reference behavior being accelerated: the reference decoder's
upsample→ConvBlock pattern (networks/flow_net_v1.py:72-78,
mobile_decoder.py:74-79 via layers.py:106-145).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fused import _parity_kernels, xavier_uniform

Array = jax.Array


def pack_w(x: Array, p: int) -> Array:
    """(B, H, W, C) → (B, H, W/p, p·C). Pure reshape (free in row-major)."""
    if p == 1:
        return x
    b, h, w, c = x.shape
    assert w % p == 0, (w, p)
    return x.reshape(b, h, w // p, p * c)


def unpack_w(x: Array, p: int) -> Array:
    """(B, H, J, p·C) → (B, H, J·p, C). Pure reshape."""
    if p == 1:
        return x
    b, h, j, pc = x.shape
    assert pc % p == 0
    return x.reshape(b, h, j * p, pc // p)


def stage_pack_factor(ch_out: int, w_out: int, enabled: bool = True) -> int:
    """Largest pack factor p ≤ 128/ch that divides the stage's output width
    (and whose p/2 divides the input width — implied by w_out = 2·w_in).
    1 = stay unpacked (channels already fill the lanes)."""
    if not enabled:
        return 1
    p = max(1, 128 // ch_out)
    while p > 1 and w_out % p != 0:
        p //= 2
    return p


def repack(x: Array, cur_p: int, new_p: int) -> Array:
    """Change pack factor (free reshapes)."""
    if cur_p == new_p:
        return x
    return pack_w(unpack_w(x, cur_p), new_p)


def packed_concat(xp: Array, yp: Array, p: int) -> Array:
    """Channel-concat two packed tensors slot-wise, so the result is the
    packing of the full-res channel concat."""
    b, h, j, pc1 = xp.shape
    _, _, _, pc2 = yp.shape
    x5 = xp.reshape(b, h, j, p, pc1 // p)
    y5 = yp.reshape(b, h, j, p, pc2 // p)
    return jnp.concatenate([x5, y5], axis=-1).reshape(b, h, j, pc1 + pc2)


def _packed_conv_kernel(w: Array, p: int) -> Array:
    """(3, 3, C, Co) → (3, 3, p·C, p·Co): K[u, g+1, s·C:, t·Co:] = W[u, v]
    with s = (t + v − 1) mod p, g = (t + v − 1) // p."""
    _, _, c, co = w.shape
    k = jnp.zeros((3, 3, p * c, p * co), w.dtype)
    for t in range(p):
        for v in range(3):
            col = t + v - 1
            g, s = col // p, col % p
            k = k.at[:, g + 1, s * c : (s + 1) * c, t * co : (t + 1) * co].add(w[:, v])
    return k


def _boundary_cols(xp: Array, p: int, mode: str) -> tuple[Array, Array]:
    """The single full-res column each side of the image that the packed
    3×3 conv reads beyond the tensor: col −1 and col W (reflect or edge)."""
    c = xp.shape[-1] // p
    if mode == "reflect":
        left = xp[:, :, 0, c : 2 * c]  # full-res col 1
        right = xp[:, :, -1, (p - 2) * c : (p - 1) * c]  # col W−2
    else:  # edge
        left = xp[:, :, 0, 0:c]  # col 0
        right = xp[:, :, -1, (p - 1) * c :]  # col W−1
    return left, right


def packed_conv3x3(xp: Array, w: Array, bias: Array | None, p: int, mode: str = "reflect") -> Array:
    """3×3 conv with 1-pixel reflect/edge padding, computed on the packed
    representation. xp: (B, H, W/p, p·C); w: (3, 3, C, Co) HWIO.

    Returns (B, H, W/p, p·Co) — the packing of conv3x3(pad1(x))."""
    b, h, j, pc = xp.shape
    c = w.shape[2]
    co = w.shape[3]
    assert pc == p * c, (pc, p, c)

    left, right = _boundary_cols(xp, p, mode)
    zeros = jnp.zeros((b, h, (p - 1) * c), xp.dtype)
    lgroup = jnp.concatenate([zeros, left], axis=-1)[:, :, None]   # slot p−1 = col −1
    rgroup = jnp.concatenate([right, zeros], axis=-1)[:, :, None]  # slot 0 = col W
    xpp = jnp.concatenate([lgroup, xp, rgroup], axis=2)
    xpp = jnp.pad(xpp, ((0, 0), (1, 1), (0, 0), (0, 0)), mode)

    k = _packed_conv_kernel(w.astype(xp.dtype), p)
    dn = jax.lax.conv_dimension_numbers(xpp.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xpp, k, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn
    )
    if bias is not None:
        by = jnp.tile(bias.astype(y.dtype), p)
        y = y + by
    return y


def _packed_upconv_kernel(w: Array, p: int) -> Array:
    """(3, 3, C, Co) → (3, 3, q·C, 2p·Co) with q = p/2, for the fused
    upsample×2+conv3×3. Output channel block (ri·p + t) holds full-res output
    (row 2a+ri, col p·J + t); it reads x rows a+ri+u′−1 (kernel row ri+u′)
    and x cols q·J + t//2 + t%2 + v′ − 1 (group (δc)//q, slot (δc)%q), with
    the parity kernels Wp[ri][t%2] from ops/fused."""
    _, _, c, co = w.shape
    q = p // 2
    pk = _parity_kernels(w)  # [ri][mj] → (2, 2, C, Co)
    k = jnp.zeros((3, 3, q * c, 2 * p * co), w.dtype)
    for ri in range(2):
        for t in range(p):
            wp = pk[ri][t % 2]
            out = (ri * p + t) * co
            for u in range(2):
                for v in range(2):
                    dc = t // 2 + t % 2 + v - 1
                    g, s = dc // q, dc % q
                    k = k.at[
                        ri + u, g + 1, s * c : (s + 1) * c, out : out + co
                    ].add(wp[u, v])
    return k


def packed_upconv(xq: Array, w: Array, bias: Array | None, p: int) -> Array:
    """Fused upsample(×2 nearest)+reflect-pad+3×3 conv on packed tensors —
    the packed equivalent of ops.fused.upsample2x_conv3x3.

    xq: (B, h, w/q, q·C) input packed by q = p/2 at the COARSE resolution.
    Returns (B, 2h, 2w/p, p·Co) packed by p at the fine resolution."""
    b, h, jq, qc = xq.shape
    q = p // 2
    c = w.shape[2]
    co = w.shape[3]
    assert qc == q * c

    # edge boundary: the window reads full-res cols −1 and w (edge-replicated)
    left, right = _boundary_cols(xq, q, "edge")
    zeros = jnp.zeros((b, h, (q - 1) * c), xq.dtype)
    lgroup = jnp.concatenate([zeros, left], axis=-1)[:, :, None]
    rgroup = jnp.concatenate([right, zeros], axis=-1)[:, :, None]
    xpp = jnp.concatenate([lgroup, xq, rgroup], axis=2)
    xpp = jnp.pad(xpp, ((0, 0), (1, 1), (0, 0), (0, 0)), "edge")

    k = _packed_upconv_kernel(w.astype(xq.dtype), p)
    dn = jax.lax.conv_dimension_numbers(xpp.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xpp, k, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn
    )  # (B, h, jq, 2·p·Co) blocks (ri, t)
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 2 * p)
    # interleave the two row-parity halves: (B,h,J,2,p·Co) → (B,2h,J,p·Co)
    y = y.reshape(b, h, jq, 2, p * co)
    y = y.transpose(0, 1, 3, 2, 4).reshape(b, 2 * h, jq, p * co)
    return y


# ------------------------------------------------------------ flax modules
# Same parameter trees as ops.fused.FusedUpConvBlock / models.layers.ConvBlock
# (…/conv/conv/{kernel,bias}) so checkpoints are interchangeable with the
# unpacked path; only the runtime layout differs.


class _PackedKernel(nn.Module):
    features: int
    p: int
    dtype: Any
    op: str  # "conv" (3×3 packed) | "upconv" (fused up+conv packed)
    mode: str = "reflect"

    @nn.compact
    def __call__(self, xp: Array) -> Array:
        q = self.p if self.op == "conv" else self.p // 2
        ci = xp.shape[-1] // q
        kernel = self.param("kernel", xavier_uniform, (3, 3, ci, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x = xp.astype(self.dtype)
        if self.op == "conv":
            return packed_conv3x3(x, kernel, bias, self.p, self.mode)
        return packed_upconv(x, kernel, bias, self.p)


class _PackedConv3x3(nn.Module):
    features: int
    p: int
    dtype: Any
    op: str
    mode: str = "reflect"

    @nn.compact
    def __call__(self, xp: Array) -> Array:
        return _PackedKernel(self.features, self.p, self.dtype, self.op, self.mode, name="conv")(xp)


class PackedConvBlock(nn.Module):
    """ConvBlock (reflect-pad 3×3 conv + ELU) on packed tensors. Parameter
    tree matches models.layers.ConvBlock."""

    features: int
    p: int
    use_elu: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xp: Array) -> Array:
        y = _PackedConv3x3(self.features, self.p, self.dtype, "conv", name="conv")(xp)
        return nn.elu(y) if self.use_elu else nn.relu(y)


class PackedFusedUpConvBlock(nn.Module):
    """FusedUpConvBlock on packed tensors: input packed by p/2 at coarse res,
    output packed by p at fine res. Parameter tree matches
    ops.fused.FusedUpConvBlock."""

    features: int
    p: int
    use_elu: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xq: Array) -> Array:
        y = _PackedConv3x3(self.features, self.p, self.dtype, "upconv", name="conv")(xq)
        return nn.elu(y) if self.use_elu else nn.relu(y)


class PackedHead(nn.Module):
    """Prediction head: packed 3×3 conv (no activation). Parameter tree
    matches models.layers.Conv3x3 (…/conv/{kernel,bias})."""

    features: int
    p: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xp: Array) -> Array:
        return _PackedKernel(self.features, self.p, self.dtype, "conv", name="conv")(xp)
