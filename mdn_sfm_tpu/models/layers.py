"""Shared conv building blocks (reference: networks/layers.py:106-145).

NHWC Flax modules. Convs run in a configurable compute dtype (bfloat16 by
default on TPU) with float32 params; reflection padding is applied manually
so the conv itself is VALID — XLA fuses pad+conv.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# Matches torch's nn.init.xavier_uniform_ used by MobileDecoder.init_weights
# (reference: networks/mobile_decoder.py:57-62).
xavier_uniform = nn.initializers.xavier_uniform()
# Matches torch's kaiming_normal_(mode='fan_out', nonlinearity='relu') used by
# the encoder (reference: networks/resnet_encoder.py:36-38).
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class Conv3x3(nn.Module):
    """Reflection-pad + 3×3 conv (reference: networks/layers.py:124-139)."""

    features: int
    use_refl: bool = True
    dtype: Any = jnp.float32
    kernel_init: Callable = xavier_uniform

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mode = "reflect" if self.use_refl else "constant"
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode)
        return nn.Conv(
            self.features,
            (3, 3),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            name="conv",
        )(x)


class ConvBlock(nn.Module):
    """Conv3x3 followed by ELU/ReLU (reference: networks/layers.py:106-121)."""

    features: int
    use_elu: bool = True
    dtype: Any = jnp.float32
    kernel_init: Callable = xavier_uniform

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv3x3(self.features, dtype=self.dtype, kernel_init=self.kernel_init, name="conv")(x)
        return nn.elu(x) if self.use_elu else nn.relu(x)
