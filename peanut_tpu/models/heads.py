"""Decode heads (flax.linen, NHWC).

Parity targets: PSPHead (pyramid pooling; reference
prediction/mmseg/models/decode_heads/psp_head.py:11-103) and FCNHead
(fcn_head.py) — the two heads on PEANUT's path — plus ASPP/DepthwiseSeparable
ASPP for zoo coverage.  The BaseDecodeHead contract (dropout before a 1x1
conv_seg classifier, logits NOT resized inside the head) follows
decode_head.py:14-231.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..registry import HEADS
from .layers import ConvModule, Conv2d
from .ops import resize_bilinear, adaptive_avg_pool


class DecodeHeadMixin:
    """Shared classifier tail: dropout -> 1x1 conv to num_classes."""

    def cls_seg(self, x, train: bool):
        if self.dropout_ratio > 0:
            x = nn.Dropout(rate=self.dropout_ratio, deterministic=not train,
                           name="dropout")(x)
        return Conv2d(self.num_classes, 1, use_bias=True, name="conv_seg")(x)


@HEADS.register()
class PSPHead(nn.Module, DecodeHeadMixin):
    """Pyramid Scene Parsing head."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dropout_ratio: float = 0.1
    in_index: int = 3
    align_corners: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs[self.in_index]
        h, w = x.shape[-3], x.shape[-2]
        ppm_outs = [x]
        for i, scale in enumerate(self.pool_scales):
            y = adaptive_avg_pool(x, scale)
            y = ConvModule(self.channels, 1, name=f"ppm{i}")(y, train=train)
            y = resize_bilinear(y, (h, w), align_corners=self.align_corners)
            ppm_outs.append(y)
        feats = jnp.concatenate(ppm_outs, axis=-1)
        feats = ConvModule(self.channels, 3, padding=1,
                           name="bottleneck")(feats, train=train)
        return self.cls_seg(feats, train)


@HEADS.register()
class FCNHead(nn.Module, DecodeHeadMixin):
    """Plain conv head (also the auxiliary head in PSPNet training)."""
    in_channels: int = 1024
    channels: int = 256
    num_classes: int = 19
    num_convs: int = 1
    kernel_size: int = 3
    concat_input: bool = False
    dropout_ratio: float = 0.1
    in_index: int = 2
    align_corners: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs[self.in_index]
        feats = x
        conv_padding = (self.kernel_size // 2) * self.dilation
        for i in range(self.num_convs):
            feats = ConvModule(self.channels, self.kernel_size,
                               padding=conv_padding, dilation=self.dilation,
                               name=f"convs{i}")(feats, train=train)
        if self.num_convs == 0:
            feats = x
        if self.concat_input:
            feats = jnp.concatenate([x, feats], axis=-1)
            feats = ConvModule(self.channels, self.kernel_size,
                               padding=self.kernel_size // 2,
                               name="conv_cat")(feats, train=train)
        return self.cls_seg(feats, train)


@HEADS.register()
class ASPPHead(nn.Module, DecodeHeadMixin):
    """DeepLabV3 ASPP head (zoo coverage; aspp_head.py)."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    dilations: Sequence[int] = (1, 12, 24, 36)
    dropout_ratio: float = 0.1
    in_index: int = 3
    align_corners: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs[self.in_index]
        h, w = x.shape[-3], x.shape[-2]
        # image-level pooling branch
        img = adaptive_avg_pool(x, 1)
        img = ConvModule(self.channels, 1, name="image_pool_conv")(img, train=train)
        img = resize_bilinear(img, (h, w), align_corners=self.align_corners)
        outs = [img]
        for i, d in enumerate(self.dilations):
            k = 1 if d == 1 else 3
            pad = 0 if d == 1 else d
            outs.append(ConvModule(self.channels, k, padding=pad, dilation=d,
                                   name=f"aspp{i}")(x, train=train))
        feats = jnp.concatenate(outs, axis=-1)
        feats = ConvModule(self.channels, 3, padding=1,
                           name="bottleneck")(feats, train=train)
        return self.cls_seg(feats, train)
