"""Fused/optimized compute ops for the hot paths."""

from .fused import FusedUpConvBlock, upsample2x_conv3x3
from .pallas_epipolar import epipolar_abs_residual_pallas

__all__ = ["FusedUpConvBlock", "upsample2x_conv3x3", "epipolar_abs_residual_pallas"]
