"""MobileNetV2 backbone (zoo; reference mmseg backbones/mobilenet_v2.py).

Dilated variant for segmentation: per-stage strides/dilations configurable;
returns features from out_indices.
"""

from __future__ import annotations

from typing import Sequence

from flax import linen as nn

from ..registry import BACKBONES
from .layers import ConvModule, Conv2d, BatchNorm


def relu6(x):
    import jax.numpy as jnp

    return jnp.clip(x, 0.0, 6.0)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int = 1
    expand_ratio: int = 6
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = cin * self.expand_ratio
        identity = x
        out = x
        if self.expand_ratio != 1:
            out = ConvModule(hidden, 1, act=relu6, name="expand")(out, train=train)
        # depthwise
        out = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                      padding=((self.dilation,) * 2, (self.dilation,) * 2),
                      kernel_dilation=(self.dilation, self.dilation),
                      feature_group_count=hidden, use_bias=False,
                      name="dw_conv")(out)
        out = BatchNorm(name="dw_bn")(out, train=train)
        out = relu6(out)
        out = Conv2d(self.out_channels, 1, use_bias=False, name="project")(out)
        out = BatchNorm(name="project_bn")(out, train=train)
        if self.stride == 1 and cin == self.out_channels:
            out = out + identity
        return out


ARCH_SETTINGS = [  # expand_ratio, channels, blocks, stride
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


@BACKBONES.register()
class MobileNetV2(nn.Module):
    widen_factor: float = 1.0
    strides: Sequence[int] = (1, 2, 2, 2, 1, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 1, 1, 1, 1)
    out_indices: Sequence[int] = (1, 2, 4, 6)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvModule(int(32 * self.widen_factor), 3, stride=2, padding=1,
                       act=relu6, name="conv1")(x, train=train)
        outs = []
        for i, (expand, ch, nblocks, _) in enumerate(ARCH_SETTINGS):
            cout = int(ch * self.widen_factor)
            for j in range(nblocks):
                x = InvertedResidual(
                    cout, stride=self.strides[i] if j == 0 else 1,
                    expand_ratio=expand, dilation=self.dilations[i],
                    name=f"layer{i + 1}_{j}")(x, train=train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
