"""MobileDecoder — the TRAINABLE network: consumes the flow decoder's feature
pyramid plus the broadcast 6-DoF pose and emits sigmoid mobile-probability
maps at 4 scales (reference: networks/mobile_decoder.py:14-85).

Feature contract: ``input_features`` is FlowNet's reversed decoder list
[d0, d1, d2, d3, d4, enc4] with channels (16, 32, 64, 128, 256, 512) at
strides (/1, /2, /4, /8, /16, /32). The bottleneck concatenates enc4 with the
pose broadcast to 6 channels (mobile_decoder.py:64-73); each up-stage i
concatenates ``input_features[i]`` after its ×2 upsample
(mobile_decoder.py:74-79).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.fused import FusedUpConvBlock
from ..ops.packed import (
    PackedConvBlock,
    PackedFusedUpConvBlock,
    PackedHead,
    pack_w,
    packed_concat,
    repack,
    stage_pack_factor,
    unpack_w,
)
from .layers import Conv3x3, ConvBlock

Array = jax.Array

NUM_CH_DEC = (16, 32, 64, 128, 256)


class MobileDecoder(nn.Module):
    """Mobile probability decoder (reference: networks/mobile_decoder.py).

    ``__call__(input_features, axisangle, translation)`` →
    {scale: (B, H/2ˢ, W/2ˢ, 1) sigmoid maps} for scale in ``scales``.
    """

    num_ch_enc: tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    scales: tuple[int, ...] = (0, 1, 2, 3)
    use_elu: bool = True
    packed: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, input_features: list[Array], axisangle: Array, translation: Array
    ) -> dict[int, Array]:
        bottleneck = input_features[-1]
        b, h, w, _ = bottleneck.shape

        # broadcast pose over the bottleneck spatial extent (mobile_decoder.py:66-68)
        aa = jnp.broadcast_to(axisangle.reshape(b, 1, 1, 3), (b, h, w, 3))
        t = jnp.broadcast_to(translation.reshape(b, 1, 1, 3), (b, h, w, 3))
        x = jnp.concatenate(
            [bottleneck, aa.astype(bottleneck.dtype), t.astype(bottleneck.dtype)], axis=-1
        )

        outputs: dict[int, Array] = {}
        cur_p = 1  # current pack factor of x (ops/packed.py)
        for i in range(4, -1, -1):
            # fused upsample+conv (ops/fused.py) — exact-equal, cheaper; the
            # small-channel stages additionally run lane-packed (ops/packed.py)
            ch = NUM_CH_DEC[i]
            w_out = x.shape[2] * cur_p * 2
            p = stage_pack_factor(ch, w_out, self.packed)
            if p > 1:
                x = repack(x, cur_p, p // 2)
                x = PackedFusedUpConvBlock(
                    ch, p, use_elu=self.use_elu, dtype=self.dtype, name=f"upconv_{i}_0"
                )(x)
                x = packed_concat(x, pack_w(input_features[i].astype(x.dtype), p), p)
                x = PackedConvBlock(
                    ch, p, use_elu=self.use_elu, dtype=self.dtype, name=f"upconv_{i}_1"
                )(x)
            else:
                x = unpack_w(x, cur_p)
                x = FusedUpConvBlock(
                    ch, use_elu=self.use_elu, dtype=self.dtype, name=f"upconv_{i}_0"
                )(x)
                x = jnp.concatenate([x, input_features[i].astype(x.dtype)], axis=-1)
                x = ConvBlock(
                    ch, use_elu=self.use_elu, dtype=self.dtype, name=f"upconv_{i}_1"
                )(x)
            cur_p = p

            if i in self.scales:
                if p > 1:
                    out = unpack_w(PackedHead(1, p, dtype=self.dtype, name=f"pred_mobile_{i}")(x), p)
                else:
                    out = Conv3x3(1, dtype=self.dtype, name=f"pred_mobile_{i}")(x)
                outputs[i] = nn.sigmoid(out.astype(jnp.float32))

        return outputs
