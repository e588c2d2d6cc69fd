"""Torch oracle of the PEANUT prediction architecture for parity testing.

Implements ResNetV1c + PSPHead + FCNHead in plain torch.nn following the
architecture spec (SURVEY.md §2.2; /root/reference/nav/pred_model_cfg.py),
with module attribute names chosen so ``state_dict()`` keys match the mmseg
checkpoint format — the same converter that ingests reference checkpoints is
exercised by the tests against this oracle.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class ConvBN(nn.Module):
    """mmcv ConvModule twin: attrs .conv/.bn so keys are x.conv.weight etc."""

    def __init__(self, cin, cout, k, stride=1, padding=0, dilation=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=padding,
                              dilation=dilation, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class Bottleneck(nn.Module):
    def __init__(self, cin, planes, stride, dilation, downsample):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idt)


class Backbone(nn.Module):
    def __init__(self, in_channels, base, stage_blocks, strides, dilations,
                 contract_dilation=True):
        super().__init__()
        stem_c = base
        self.stem = nn.Sequential(
            nn.Conv2d(in_channels, stem_c // 2, 3, 2, 1, bias=False),
            nn.BatchNorm2d(stem_c // 2), nn.ReLU(True),
            nn.Conv2d(stem_c // 2, stem_c // 2, 3, 1, 1, bias=False),
            nn.BatchNorm2d(stem_c // 2), nn.ReLU(True),
            nn.Conv2d(stem_c // 2, stem_c, 3, 1, 1, bias=False),
            nn.BatchNorm2d(stem_c), nn.ReLU(True))
        cin = stem_c
        for i, nblocks in enumerate(stage_blocks):
            planes = base * 2 ** i
            blocks = []
            for j in range(nblocks):
                stride = strides[i] if j == 0 else 1
                dil = dilations[i]
                if j == 0 and dil > 1 and contract_dilation:
                    dil = dil // 2
                down = None
                if j == 0 and (strides[i] != 1 or cin != planes * 4):
                    down = nn.Sequential(
                        nn.Conv2d(cin, planes * 4, 1, strides[i], bias=False),
                        nn.BatchNorm2d(planes * 4))
                blocks.append(Bottleneck(cin, planes, stride, dil, down))
                cin = planes * 4
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
        self.num_stages = len(stage_blocks)

    def forward(self, x):
        x = self.stem(x)
        x = F.max_pool2d(x, 3, 2, 1)
        outs = []
        for i in range(self.num_stages):
            x = getattr(self, f"layer{i + 1}")(x)
            outs.append(x)
        return outs


class PSPHead(nn.Module):
    def __init__(self, cin, channels, num_classes, pool_scales=(1, 2, 3, 6)):
        super().__init__()
        self.psp_modules = nn.ModuleList([
            nn.Sequential(nn.AdaptiveAvgPool2d(s), ConvBN(cin, channels, 1))
            for s in pool_scales])
        self.bottleneck = ConvBN(cin + channels * len(pool_scales),
                                 channels, 3, padding=1)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x):
        outs = [x]
        for m in self.psp_modules:
            y = m(x)
            outs.append(F.interpolate(y, x.shape[2:], mode="bilinear",
                                      align_corners=False))
        y = self.bottleneck(torch.cat(outs, 1))
        return self.conv_seg(y)


class FCNHead(nn.Module):
    def __init__(self, cin, channels, num_classes):
        super().__init__()
        self.convs = nn.ModuleList([ConvBN(cin, channels, 3, padding=1)])
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x):
        for m in self.convs:
            x = m(x)
        return self.conv_seg(x)


class OraclePSPNet(nn.Module):
    def __init__(self, in_channels=14, num_classes=6, base=16,
                 stage_blocks=(3, 4, 6, 3), strides=(1, 2, 1, 1),
                 dilations=(1, 1, 2, 4)):
        super().__init__()
        self.backbone = Backbone(in_channels, base, stage_blocks, strides,
                                 dilations)
        self.decode_head = PSPHead(base * 8 * 4, base * 8, num_classes)
        self.auxiliary_head = FCNHead(base * 4 * 4, base * 4, num_classes)

    def forward(self, x, with_aux=False):
        feats = self.backbone(x)
        logits = self.decode_head(feats[3])
        logits = F.interpolate(logits, x.shape[2:], mode="bilinear",
                               align_corners=False)
        if with_aux:
            aux = F.interpolate(self.auxiliary_head(feats[2]), x.shape[2:],
                                mode="bilinear", align_corners=False)
            return logits, aux
        return logits


def randomize_bn_stats(model, rng):
    """Give every BN random running stats so eval-mode parity is meaningful."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.5))
            m.running_var.copy_(torch.from_numpy(
                0.5 + rng.rand(m.num_features).astype(np.float32)))
            m.weight.data.copy_(torch.from_numpy(
                0.5 + rng.rand(m.num_features).astype(np.float32)))
            m.bias.data.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.1))
