"""Independent PyTorch twins of the three networks, built from the published
architecture spec (reference: networks/flow_net_v1.py:17-110,
pose_net_v3.py:16-84, mobile_decoder.py:14-85, resnet_encoder.py:17-100 —
used as a SPEC, not copied) with torchvision-compatible state-dict names.

Purpose: cross-framework forward-parity tests — weights exported from the
Flax models via ``checkpoints.export_pth`` must load into these twins with
``strict=True`` and produce equal forwards (tests/test_torch_parity.py).
torchvision is not installed in this environment, so the resnet18 trunk is
reimplemented here with matching parameter names (conv1/bn1/layerL.b.*).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

NUM_CH_DEC = (16, 32, 64, 128, 256)
NUM_CH_ENC = (64, 64, 128, 256, 512)


class BasicBlock(nn.Module):
    def __init__(self, cin: int, cout: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idn)


class ResNet18Trunk(nn.Module):
    """torchvision-named resnet18 trunk widened to 2 stacked input frames."""

    def __init__(self, in_ch: int = 6):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        widths = (64, 128, 256, 512)
        cin = 64
        for i, w in enumerate(widths):
            stride = 1 if i == 0 else 2
            layer = nn.Sequential(BasicBlock(cin, w, stride), BasicBlock(w, w, 1))
            setattr(self, f"layer{i + 1}", layer)
            cin = w

    def pyramid(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        feats = [x]
        x = self.maxpool(x)
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
            feats.append(x)
        return feats  # [64, 64, 128, 256, 512] at /2../32


class EncoderWrap(nn.Module):
    """Matches the reference's ResnetEncoder nesting: encoder.encoder.*"""

    def __init__(self, in_ch: int = 6):
        super().__init__()
        self.encoder = ResNet18Trunk(in_ch)

    def forward(self, x):
        return self.encoder.pyramid(x)


class Conv3x3(nn.Module):
    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.pad = nn.ReflectionPad2d(1)
        self.conv = nn.Conv2d(cin, cout, 3)

    def forward(self, x):
        return self.conv(self.pad(x))


class ConvBlock(nn.Module):
    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.conv = Conv3x3(cin, cout)

    def forward(self, x):
        return F.elu(self.conv(x))


def _up(x):
    return F.interpolate(x, scale_factor=2, mode="nearest")


class FlowDecoderTwin(nn.Module):
    """ModuleList layout: indices 0..9 = upconv_{4..0}_{0,1}; 10+s = the
    scale-s flow head (matches checkpoints._seq_decoder_name)."""

    def __init__(self):
        super().__init__()
        mods = []
        for i in range(4, -1, -1):
            cin0 = NUM_CH_ENC[4] if i == 4 else NUM_CH_DEC[i + 1]
            mods.append(ConvBlock(cin0, NUM_CH_DEC[i]))
            cin1 = NUM_CH_DEC[i] + (NUM_CH_ENC[i - 1] if i > 0 else 0)
            mods.append(ConvBlock(cin1, NUM_CH_DEC[i]))
        for s in range(4):
            mods.append(Conv3x3(NUM_CH_DEC[s], 2))
        self.flow_net = nn.ModuleList(mods)

    def forward(self, enc_feats):
        flow_scale = F.relu(torch.tensor(0.1) - 1e-3) + 1e-3
        x = enc_feats[-1]
        dec = [x]
        flows = {}
        for i in range(4, -1, -1):
            x = self.flow_net[(4 - i) * 2](_up(x))
            if i > 0:
                x = torch.cat([x, enc_feats[i - 1]], 1)
            x = self.flow_net[(4 - i) * 2 + 1](x)
            dec.append(x)
            if i < 4:
                flows[i] = flow_scale * self.flow_net[10 + i](x)
        return flows, dec[::-1]


class FlowNetTwin(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = EncoderWrap(6)
        self.decoder = FlowDecoderTwin()

    def forward(self, img1, img2):
        feats = self.encoder(torch.cat([img1, img2], 1))
        return self.decoder(feats)


class PoseDecoderTwin(nn.Module):
    def __init__(self):
        super().__init__()
        self.pose_net = nn.ModuleList(
            [
                nn.Conv2d(512, 256, 1),
                nn.Conv2d(256, 256, 3, 2, 1),
                nn.Conv2d(256, 256, 3, 2, 1),
                nn.Conv2d(256, 6, 1),
            ]
        )

    def forward(self, last):
        x = F.relu(self.pose_net[0](last))
        x = F.relu(self.pose_net[1](x))
        x = F.relu(self.pose_net[2](x))
        x = self.pose_net[3](x)
        out = x.mean((2, 3)).view(-1, 1, 1, 6)
        scale = F.relu(torch.tensor(0.01) - 1e-3) + 1e-3
        return scale * out[..., :3], scale * out[..., 3:]


class PoseNetTwin(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = EncoderWrap(6)
        self.decoder = PoseDecoderTwin()

    def forward(self, img1, img2):
        feats = self.encoder(torch.cat([img1, img2], 1))
        return self.decoder(feats[-1])


class MobileDecoderTwin(nn.Module):
    """Consumes the flow decoder's reversed feature list [16..512]ch plus the
    6-DoF pose broadcast over the bottleneck."""

    MOBILE_CH = (16, 32, 64, 128, 256, 512)

    def __init__(self):
        super().__init__()
        mods = []
        for i in range(4, -1, -1):
            cin0 = (self.MOBILE_CH[5] + 6) if i == 4 else NUM_CH_DEC[i + 1]
            mods.append(ConvBlock(cin0, NUM_CH_DEC[i]))
            mods.append(ConvBlock(NUM_CH_DEC[i] + self.MOBILE_CH[i], NUM_CH_DEC[i]))
        for s in range(4):
            mods.append(Conv3x3(NUM_CH_DEC[s], 1))
        self.mobile_net = nn.ModuleList(mods)

    def forward(self, input_features, axisangle, translation):
        b, _, h, w = input_features[-1].shape
        aa = axisangle.view(b, 3, 1, 1).expand(b, 3, h, w)
        t = translation.view(b, 3, 1, 1).expand(b, 3, h, w)
        x = torch.cat([input_features[-1], aa, t], 1)
        outs = {}
        for i in range(4, -1, -1):
            x = self.mobile_net[(4 - i) * 2](_up(x))
            x = torch.cat([x, input_features[i]], 1)
            x = self.mobile_net[(4 - i) * 2 + 1](x)
            if i < 4:
                outs[i] = torch.sigmoid(self.mobile_net[10 + i](x))
        return outs
