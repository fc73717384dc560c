"""PoseNet — 2-frame ResNet encoder + conv pose head
(reference: networks/pose_net_v3.py:16-84).

Output: (axisangle, translation), each (B, 1, 1, 3), scaled by
relu(s − 1e-3) + 1e-3 with s = 0.01 (pose_net_v3.py:7-9,58-62).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import ResNetEncoder

Array = jax.Array

SCALE_TRANSLATION = 0.01
SCALE_ROTATION = 0.01
CONSTRAINT_MIN = 1e-3


class PoseDecoder(nn.Module):
    """squeeze(1×1, 256) → 3 convs (stride 2 in the reference wiring) →
    global mean → 6 values (reference: networks/pose_net_v3.py:16-64)."""

    stride: int = 2  # PoseNet_v3 wires stride=2 (pose_net_v3.py:74)
    use_elu: bool = False
    scale_trainable: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, last_features: Array) -> tuple[Array, Array]:
        nonlin = nn.elu if self.use_elu else nn.relu
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f,
            (k, k),
            strides=(s, s),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )

        out = nonlin(conv(256, 1, 1, "squeeze")(last_features.astype(self.dtype)))
        out = nonlin(conv(256, 3, self.stride, "pose_0")(out))
        out = nonlin(conv(256, 3, self.stride, "pose_1")(out))
        out = conv(6, 1, 1, "pose_2")(out)

        out = jnp.mean(out.astype(jnp.float32), axis=(1, 2))  # (B, 6)
        out = out.reshape(-1, 1, 1, 6)

        if self.scale_trainable:
            rot_s = self.param("rotation_scale", lambda _: jnp.array(0.01, jnp.float32))
            tr_s = self.param("translation_scale", lambda _: jnp.array(0.01, jnp.float32))
        else:
            rot_s = jnp.array(SCALE_ROTATION, jnp.float32)
            tr_s = jnp.array(SCALE_TRANSLATION, jnp.float32)
        rot_s = nn.relu(rot_s - CONSTRAINT_MIN) + CONSTRAINT_MIN
        tr_s = nn.relu(tr_s - CONSTRAINT_MIN) + CONSTRAINT_MIN

        axisangle = rot_s * out[..., :3]
        translation = tr_s * out[..., 3:]
        return axisangle, translation


class PoseNet(nn.Module):
    """Full pose network (reference: networks/pose_net_v3.py:67-84)."""

    num_layers: int = 18
    use_elu: bool = False
    scale_trainable: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, img1: Array, img2: Array, train: bool = False) -> tuple[Array, Array]:
        x = jnp.concatenate([img1, img2], axis=-1)
        features = ResNetEncoder(
            num_layers=self.num_layers, num_input_images=2, dtype=self.dtype, name="encoder"
        )(x, train=train)
        return PoseDecoder(
            use_elu=self.use_elu,
            scale_trainable=self.scale_trainable,
            dtype=self.dtype,
            name="decoder",
        )(features[-1])
