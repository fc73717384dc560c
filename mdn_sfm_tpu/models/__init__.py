"""Flax models — TPU-native counterparts of the reference networks/ package.

All modules are NHWC, support a bfloat16 compute dtype with float32 params,
and keep the reference's feature-pyramid contracts:

- :class:`ResNetEncoder` — 5-level pyramid [64,64,128,256,512] at /2../32
  (reference: networks/resnet_encoder.py:64-100)
- :class:`FlowNet` — flow pyramid at 4 scales + 6-level decoder feature list
  [16,32,64,128,256,512]ch (reference: networks/flow_net_v1.py:17-110)
- :class:`PoseNet` — axis-angle + translation, ×0.01
  (reference: networks/pose_net_v3.py:16-84)
- :class:`MobileDecoder` — sigmoid mobile maps at 4 scales
  (reference: networks/mobile_decoder.py:14-85)
"""

from .layers import Conv3x3, ConvBlock
from .resnet import ResNetEncoder
from .flow_net import FlowDecoder, FlowNet
from .pose_net import PoseDecoder, PoseNet
from .mobile_decoder import MobileDecoder

__all__ = [
    "Conv3x3",
    "ConvBlock",
    "ResNetEncoder",
    "FlowDecoder",
    "FlowNet",
    "PoseDecoder",
    "PoseNet",
    "MobileDecoder",
]
