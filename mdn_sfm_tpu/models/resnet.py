"""ResNet multi-image encoder (reference: networks/resnet_encoder.py:17-100).

NHWC Flax reimplementation of the torchvision ResNet trunk with a widened
first conv for stacked input frames. Returns the 5-level feature pyramid
[64, 64, 128, 256, 512] at strides /2, /4, /8, /16, /32 — the contract the
flow/pose decoders depend on.

Module names mirror torchvision's state-dict keys (conv1/bn1/layer{L}_{b}/
downsample) so reference ``.pth`` checkpoints map 1:1 into this tree
(:mod:`mdn_sfm_tpu.checkpoints`).

BatchNorm: parameters + running stats live in float32; conv compute in
``dtype``. The frozen flow/pose encoders run with running averages by
default (``cfg.bn_frozen_eval``); the reference quirkily keeps frozen models
in train mode (trainer.py:201-205) — reproducible via train=True.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import kaiming_out

Array = jax.Array

_STAGES = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}
_BOTTLENECK = {18: False, 34: False, 50: True, 101: True, 152: True}


def _bn(name: str, dtype: Any, train: bool):
    bn = nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )
    return bn


def _conv(features: int, kernel: int, stride: int, dtype: Any, name: str) -> nn.Conv:
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kaiming_out,
        name=name,
    )


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3×3-BN-ReLU-3×3-BN + skip."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        identity = x
        out = _conv(self.features, 3, self.stride, self.dtype, "conv1")(x)
        out = nn.relu(_bn("bn1", self.dtype, train)(out))
        out = _conv(self.features, 3, 1, self.dtype, "conv2")(out)
        out = _bn("bn2", self.dtype, train)(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = _conv(self.features, 1, self.stride, self.dtype, "downsample_conv")(x)
            identity = _bn("downsample_bn", self.dtype, train)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """Bottleneck: 1×1-3×3-1×1 with 4× expansion. torchvision puts the
    stride on the 3×3; detectron2's caffe-style R50 (used by the frozen
    Mask R-CNN) strides the first 1×1 (``stride_in_1x1``)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32
    stride_in_1x1: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        identity = x
        out_ch = self.features * 4
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        out = _conv(self.features, 1, s1, self.dtype, "conv1")(x)
        out = nn.relu(_bn("bn1", self.dtype, train)(out))
        out = _conv(self.features, 3, s3, self.dtype, "conv2")(out)
        out = nn.relu(_bn("bn2", self.dtype, train)(out))
        out = _conv(out_ch, 1, 1, self.dtype, "conv3")(out)
        out = _bn("bn3", self.dtype, train)(out)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = _conv(out_ch, 1, self.stride, self.dtype, "downsample_conv")(x)
            identity = _bn("downsample_bn", self.dtype, train)(identity)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """Multi-image ResNet encoder returning the 5-level pyramid
    (reference: networks/resnet_encoder.py:89-100).

    Args:
        num_layers: 18, 34, 50, 101 or 152 (reference resnet_encoder.py:70-77).
        num_input_images: frames stacked channel-wise (2 for flow/pose nets,
            reference: flow_net_v1.py:92-95).
        n_ch: extra input channels (reference: resnet_encoder.py:26-27).
        dtype: conv compute dtype (bfloat16 on TPU).
    """

    num_layers: int = 18
    num_input_images: int = 2
    n_ch: int = 0
    dtype: Any = jnp.bfloat16

    @property
    def num_ch_enc(self) -> tuple[int, ...]:
        if self.num_layers > 34:
            return (64, 256, 512, 1024, 2048)
        return (64, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> list[Array]:
        if self.num_layers not in _STAGES:
            raise ValueError(f"{self.num_layers} is not a supported resnet depth")
        blocks = _STAGES[self.num_layers]
        block_cls = Bottleneck if _BOTTLENECK[self.num_layers] else BasicBlock

        x = x.astype(self.dtype)
        features: list[Array] = []

        # stem: 7×7/2 conv → BN → ReLU (resnet_encoder.py:26-29)
        x = _conv(64, 7, 2, self.dtype, "conv1")(x)
        x = nn.relu(_bn("bn1", self.dtype, train)(x))
        features.append(x)  # /2, 64ch

        # maxpool 3×3/2 pad 1 (resnet_encoder.py:30)
        x = nn.max_pool(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf),
            (3, 3),
            strides=(2, 2),
            padding="VALID",
        )

        widths = (64, 128, 256, 512)
        for stage, (width, n_blocks) in enumerate(zip(widths, blocks)):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = block_cls(
                    width,
                    stride if b == 0 else 1,
                    self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            features.append(x)

        return features
