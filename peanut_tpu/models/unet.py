"""U-Net backbone (zoo; reference mmseg backbones/unet.py).

Encoder-decoder with skip connections; returns decoder stages so standard
decode heads can consume any scale.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..registry import BACKBONES
from .layers import ConvModule, max_pool_torch
from .ops import resize_bilinear


class DoubleConv(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvModule(self.channels, 3, padding=1, name="conv0")(x, train=train)
        x = ConvModule(self.channels, 3, padding=1, name="conv1")(x, train=train)
        return x


@BACKBONES.register()
class UNet(nn.Module):
    base_channels: int = 64
    num_stages: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        for i in range(self.num_stages):
            ch = self.base_channels * 2 ** i
            if i > 0:
                x = max_pool_torch(x, 2, 2, 0)
            x = DoubleConv(ch, name=f"enc{i}")(x, train=train)
            skips.append(x)

        outs = [skips[-1]]
        for i in range(self.num_stages - 2, -1, -1):
            ch = self.base_channels * 2 ** i
            h, w = skips[i].shape[-3], skips[i].shape[-2]
            x = resize_bilinear(x, (h, w), align_corners=False)
            x = jnp.concatenate([skips[i], x], axis=-1)
            x = DoubleConv(ch, name=f"dec{i}")(x, train=train)
            outs.append(x)
        return tuple(reversed(outs))  # fine -> coarse
