"""Fused upsample+conv for the decoder hot loop.

Every decoder stage in the reference does ``upsample(×2 nearest) →
reflect-pad → 3×3 conv → ELU`` (flow_net_v1.py:72-78, mobile_decoder.py:74-79
via layers.py:106-145). Materializing the ×4-larger upsampled tensor and
convolving it is the single hottest pattern in the train step.

Algebraic fusion: with ``up[r] = x[r // 2]``, each 3×3 window over ``up``
only ever touches 2 distinct source rows/cols, with the pattern determined
by output parity:

  even output (2a):  taps rows (2a−1, 2a, 2a+1) → x rows (a−1, a, a)
                     ⇒ 2-tap kernel (w₀, w₁+w₂) at (a−1, a)
  odd  output (2a+1): taps rows (2a, 2a+1, 2a+2) → x rows (a, a, a+1)
                     ⇒ 2-tap kernel (w₀+w₁, w₂) at (a, a+1)

So the whole op is FOUR 2×2 convolutions on the low-res input (one per
output-parity pair), interleaved — 16 MACs per low-res pixel instead of 36,
and no upsampled intermediate in HBM. Reflect padding of the upsampled
tensor (up[−1] = up[1] = x[0]) reduces to EDGE padding of x. The result is
bit-exact w.r.t. the reference pattern, and jax.grad differentiates it
directly (the backward is the same 2.25× cheaper graph).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# same init as models.layers.xavier_uniform (imported locally to avoid a
# package-level import cycle: models.flow_net → ops.fused → models)
xavier_uniform = nn.initializers.xavier_uniform()


def _parity_kernels(kernel: Array) -> list[list[Array]]:
    """Split a (3, 3, Ci, Co) kernel into four (2, 2, Ci, Co) parity kernels.

    Index [pi][pj] serves output pixels (2a+pi, 2b+pj)."""
    w = kernel
    # row-combined pairs: parity 0 → (w0, w1+w2); parity 1 → (w0+w1, w2)
    rows = [
        jnp.stack([w[0], w[1] + w[2]], axis=0),      # (2, 3, Ci, Co)
        jnp.stack([w[0] + w[1], w[2]], axis=0),
    ]
    out = []
    for pi in (0, 1):
        r = rows[pi]
        cols = [
            jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1),   # (2, 2, Ci, Co)
            jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1),
        ]
        out.append(cols)
    return out


def _transposed_kernel(kernel: Array) -> Array:
    """Rearrange the four parity 2×2 kernels into ONE 4×4 transposed-conv
    kernel: K4[pi + 2u, pj + 2v] = Wp[pi][pj][u, v]. With lhs_dilation=2 the
    dilation zeros select the right parity automatically."""
    pk = _parity_kernels(kernel)
    rows = []
    for t_i in range(4):
        pi, u = t_i % 2, t_i // 2
        cols = []
        for t_j in range(4):
            pj, v = t_j % 2, t_j // 2
            cols.append(pk[pi][pj][u, v])
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)  # (4, 4, Ci, Co)


def upsample2x_conv3x3(x: Array, kernel: Array, bias: Array | None = None) -> Array:
    """ELU-less fused op: conv3x3(reflect_pad(upsample2x(x))) computed as a
    single fractionally-strided (lhs_dilation=2) conv with a 4×4 kernel on
    the edge-padded low-res input — one MXU conv, no upsampled intermediate
    and no parity-interleave copies (those showed up as slice/copy fusions in
    profiles of the 4-conv formulation).

    Args:
        x: (B, H, W, Ci)
        kernel: (3, 3, Ci, Co) HWIO
        bias: (Co,) or None
    Returns:
        (B, 2H, 2W, Co)
    """
    ci = x.shape[-1]
    co = kernel.shape[-1]
    K4 = _transposed_kernel(kernel.astype(x.dtype))

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    dn = jax.lax.conv_dimension_numbers(xp.shape, (4, 4, ci, co), ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xp, K4, window_strides=(1, 1), padding=((0, 0), (0, 0)),
        lhs_dilation=(2, 2), dimension_numbers=dn,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class _FusedKernel(nn.Module):
    """Innermost param holder named 'conv' so the tree path matches
    Conv3x3's nn.Conv ('conv/kernel', 'conv/bias') for .pth interop."""

    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ci = x.shape[-1]
        kernel = self.param("kernel", xavier_uniform, (3, 3, ci, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return upsample2x_conv3x3(x.astype(self.dtype), kernel, bias)


class _FusedConv3x3(nn.Module):
    """Mirrors Conv3x3's module nesting (name 'conv')."""

    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return _FusedKernel(self.features, self.dtype, name="conv")(x)


class FusedUpConvBlock(nn.Module):
    """Drop-in replacement for ``ConvBlock(upsample_nearest_2x(x))`` with the
    SAME parameter tree (…/conv/conv/{kernel,bias}), so checkpoints are
    interchangeable with the unfused path."""

    features: int
    use_elu: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = _FusedConv3x3(self.features, self.dtype, name="conv")(x)
        return nn.elu(y) if self.use_elu else nn.relu(y)
