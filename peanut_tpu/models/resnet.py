"""ResNet / ResNetV1c backbones (flax.linen, NHWC).

Architecture parity with the reference zoo's resnet
(/root/reference/prediction/mmseg/models/backbones/resnet.py:311-689):
bottleneck blocks, 'pytorch' style (stride on the 3x3 conv), per-stage
strides/dilations with ``contract_dilation`` (first block of a dilated stage
uses dilation//2), and the v1c deep stem (three 3x3 convs).  The PEANUT
prediction net is ResNetV1c-50 with strides (1,2,1,1) and dilations
(1,1,2,4) on a 14-channel input (/root/reference/nav/pred_model_cfg.py:4-17).
"""

from __future__ import annotations

from typing import Sequence, Tuple

from flax import linen as nn

from ..registry import BACKBONES
from .layers import ConvModule, Conv2d, BatchNorm, max_pool_torch


class Bottleneck(nn.Module):
    planes: int                  # mid channels; out = planes * 4
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    style: str = "pytorch"
    groups: int = 1              # >1 = ResNeXt grouped 3x3
    base_width: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        if self.style == "pytorch":
            s1, s2 = 1, self.stride
        else:  # caffe style: stride on the 1x1
            s1, s2 = self.stride, 1
        if self.groups == 1:
            width = self.planes
        else:  # resnext.py width rule
            width = int(self.planes * (self.base_width / 64)) * self.groups

        out = Conv2d(width, 1, stride=s1, use_bias=False, name="conv1")(x)
        out = BatchNorm(name="bn1")(out, train=train)
        out = nn.relu(out)
        out = Conv2d(width, 3, stride=s2, padding=self.dilation,
                     dilation=self.dilation, groups=self.groups,
                     use_bias=False, name="conv2")(out)
        out = BatchNorm(name="bn2")(out, train=train)
        out = nn.relu(out)
        out = Conv2d(self.planes * 4, 1, use_bias=False, name="conv3")(out)
        out = BatchNorm(name="bn3")(out, train=train)

        if self.downsample:
            identity = Conv2d(self.planes * 4, 1, stride=self.stride,
                              use_bias=False, name="downsample_conv")(x)
            identity = BatchNorm(name="downsample_bn")(identity, train=train)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    style: str = "pytorch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = Conv2d(self.planes, 3, stride=self.stride, padding=self.dilation,
                     dilation=self.dilation, use_bias=False, name="conv1")(x)
        out = BatchNorm(name="bn1")(out, train=train)
        out = nn.relu(out)
        out = Conv2d(self.planes, 3, padding=1, use_bias=False, name="conv2")(out)
        out = BatchNorm(name="bn2")(out, train=train)
        if self.downsample:
            identity = Conv2d(self.planes, 1, stride=self.stride,
                              use_bias=False, name="downsample_conv")(x)
            identity = BatchNorm(name="downsample_bn")(identity, train=train)
        return nn.relu(out + identity)


ARCH = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


@BACKBONES.register()
class ResNet(nn.Module):
    """Configurable ResNet returning features from ``out_indices`` stages."""
    depth: int = 50
    in_channels: int = 3
    stem_channels: int = 64
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    style: str = "pytorch"
    deep_stem: bool = False
    avg_down: bool = False
    contract_dilation: bool = False
    norm_eval: bool = False
    groups: int = 1              # ResNeXt cardinality
    base_width: int = 4          # ResNeXt width per group
    pretrained: str | None = None  # accepted for config parity; unused
    remat: bool = False          # rematerialize each residual block in
                                 # backward (jax.checkpoint): ~1.3x FLOPs
                                 # for stage-boundary-only activation
                                 # memory — the 960^2 training recipe needs
                                 # this on a 16 GB chip

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_blocks = ARCH[self.depth]
        if self.norm_eval:
            train = False

        if self.deep_stem:
            # v1c stem: 3x (conv3x3 + BN + ReLU), first at stride 2
            x = ConvModule(self.stem_channels // 2, 3, stride=2, padding=1,
                           name="stem0")(x, train=train)
            x = ConvModule(self.stem_channels // 2, 3, stride=1, padding=1,
                           name="stem1")(x, train=train)
            x = ConvModule(self.stem_channels, 3, stride=1, padding=1,
                           name="stem2")(x, train=train)
        else:
            x = Conv2d(self.stem_channels, 7, stride=2, padding=3,
                       use_bias=False, name="conv1")(x)
            x = BatchNorm(name="bn1")(x, train=train)
            x = nn.relu(x)
        x = max_pool_torch(x, 3, 2, 1)

        outs = []
        expansion = 4 if block_cls is Bottleneck else 1
        for i in range(self.num_stages):
            planes = self.base_channels * 2 ** i
            stride = self.strides[i]
            dilation = self.dilations[i]
            for j in range(stage_blocks[i]):
                first = j == 0
                needs_down = first and (
                    stride != 1 or x.shape[-1] != planes * expansion)
                if first and dilation > 1 and self.contract_dilation:
                    d = dilation // 2
                else:
                    d = dilation
                extra = (dict(groups=self.groups, base_width=self.base_width)
                         if block_cls is Bottleneck else {})
                cls = nn.remat(block_cls, static_argnums=(2,)) \
                    if self.remat else block_cls
                block = cls(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=d if first else dilation,
                    downsample=needs_down,
                    style=self.style,
                    name=f"layer{i + 1}_{j}", **extra)
                x = block(x, train) if self.remat \
                    else block(x, train=train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register()
class ResNetV1c(ResNet):
    """ResNet with the deep (3x conv3x3) stem — the PEANUT backbone."""
    deep_stem: bool = True


@BACKBONES.register()
class ResNeXt(ResNet):
    """ResNeXt (reference resnext.py): grouped 3x3 bottleneck convs.
    Standard configs: groups=32, base_width=4 (resnext50_32x4d)."""
    groups: int = 32
    base_width: int = 4
