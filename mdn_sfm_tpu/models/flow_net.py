"""FlowNet — 2-frame ResNet encoder + top-down flow decoder
(reference: networks/flow_net_v1.py:17-110).

Contract preserved from the reference:
- flow predicted at scales 0..3 in NORMALIZED image units (multiply by
  ``geometry.scale_factor`` for pixels), scaled by
  flow_scale = relu(s − 1e-3) + 1e-3 with s = 0.1 fixed (or a trainable
  scalar initialized at 0.01) — flow_net_v1.py:8-9,53-57,67.
- returns the decoder feature list in coarse→fine reversed order
  [d0, d1, d2, d3, d4, enc4] with channels [16, 32, 64, 128, 256, 512]
  (flow_net_v1.py:70-85), which is exactly MobileDecoder's ``num_ch_enc``
  (mobile_decoder.py:23-24).
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
from .resnet import ResNetEncoder

Array = jax.Array

SCALE_FLOW = 0.1
CONSTRAINT_MIN = 1e-3

NUM_CH_DEC = (16, 32, 64, 128, 256)


class FlowDecoder(nn.Module):
    """Top-down decoder: per level upsample×2 → ConvBlock → skip-concat →
    ConvBlock, with 2-channel flow heads at 4 scales
    (reference: networks/flow_net_v1.py:17-85)."""

    num_ch_enc: tuple[int, ...] = (64, 64, 128, 256, 512)
    scales: tuple[int, ...] = (0, 1, 2, 3)
    use_elu: bool = True
    scale_trainable: bool = False
    packed: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, input_features: list[Array]) -> tuple[dict[int, Array], list[Array]]:
        if self.scale_trainable:
            flow_scale_raw = self.param(
                "flow_scale", lambda _: jnp.array(0.01, jnp.float32)
            )
        else:
            flow_scale_raw = jnp.array(SCALE_FLOW, jnp.float32)
        flow_scale = nn.relu(flow_scale_raw - CONSTRAINT_MIN) + CONSTRAINT_MIN

        outputs: dict[int, Array] = {}
        dec_features: list[Array] = []

        x = input_features[-1]
        dec_features.append(x)
        cur_p = 1  # current pack factor of x (ops/packed.py)
        for i in range(4, -1, -1):
            # fused upsample(×2)+reflect-pad+3×3conv+ELU — exact-equal to the
            # reference's upsample→ConvBlock pattern, 2.25× fewer MACs; the
            # small-channel stages additionally run lane-packed (ops/packed.py)
            ch = NUM_CH_DEC[i]
            w_out = x.shape[2] * cur_p * 2
            p = stage_pack_factor(ch, w_out, self.packed)
            if p > 1:
                x = repack(x, cur_p, p // 2)
                x = PackedFusedUpConvBlock(
                    ch, p, use_elu=self.use_elu, dtype=self.dtype, name=f"upconv_{i}_0"
                )(x)
                if i > 0:
                    skip = pack_w(input_features[i - 1].astype(x.dtype), p)
                    x = packed_concat(x, skip, p)
                x = PackedConvBlock(
                    ch, p, use_elu=self.use_elu, dtype=self.dtype, name=f"upconv_{i}_1"
                )(x)
            else:
                x = unpack_w(x, cur_p)
                x = FusedUpConvBlock(
                    ch, use_elu=self.use_elu, dtype=self.dtype, name=f"upconv_{i}_0"
                )(x)
                if i > 0:
                    x = jnp.concatenate([x, input_features[i - 1].astype(x.dtype)], axis=-1)
                x = ConvBlock(
                    ch, use_elu=self.use_elu, dtype=self.dtype, name=f"upconv_{i}_1"
                )(x)
            cur_p = p
            dec_features.append(unpack_w(x, p))

            if i in self.scales:
                if p > 1:
                    flow = unpack_w(PackedHead(2, p, dtype=self.dtype, name=f"pred_flow_{i}")(x), p)
                else:
                    flow = Conv3x3(2, dtype=self.dtype, name=f"pred_flow_{i}")(x)
                outputs[i] = flow_scale * flow.astype(jnp.float32)

        # [d0, d1, d2, d3, d4, enc4] — 16,32,64,128,256,512 ch
        return outputs, dec_features[::-1]


class FlowNet(nn.Module):
    """Full flow network (reference: networks/flow_net_v1.py:88-110).

    ``__call__(img1, img2)`` → ({scale: flow (B,Hs,Ws,2)}, decoder features).
    """

    num_layers: int = 18
    use_elu: bool = True
    scale_trainable: bool = False
    n_ch: int = 0
    scales: tuple[int, ...] = (0, 1, 2, 3)
    packed: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        img1: Array,
        img2: Array,
        extras: list[Array] | None = None,
        train: bool = False,
    ) -> tuple[dict[int, Array], list[Array]]:
        """extras: additional channel-stacked inputs (rigid warp image / rigid
        flow / warp error) when n_ch > 0 — the reference's use_rigid path
        (flow_net_v1.py:103-107, eval_utils.py:220-225)."""
        parts = [img1, img2]
        if self.n_ch:
            assert extras, "n_ch > 0 requires the rigid extra inputs"
            parts += list(extras)
        x = jnp.concatenate(parts, axis=-1)
        encoder = ResNetEncoder(
            num_layers=self.num_layers,
            num_input_images=2,
            n_ch=self.n_ch,
            dtype=self.dtype,
            name="encoder",
        )
        features = encoder(x, train=train)
        decoder = FlowDecoder(
            num_ch_enc=encoder.num_ch_enc,
            scales=self.scales,
            use_elu=self.use_elu,
            scale_trainable=self.scale_trainable,
            packed=self.packed,
            dtype=self.dtype,
            name="decoder",
        )
        return decoder(features)
