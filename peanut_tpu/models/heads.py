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
        if isinstance(self.in_index, (tuple, list)):
            # mmseg 'resize_concat': upsample selections to the finest level
            sel = [inputs[i] for i in self.in_index]
            hw = (sel[0].shape[-3], sel[0].shape[-2])
            x = jnp.concatenate(
                [resize_bilinear(f, hw, align_corners=self.align_corners)
                 for f in sel], axis=-1)
        else:
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
class UPerHead(nn.Module, DecodeHeadMixin):
    """Unified Perceptual Parsing head (uper_head.py): PPM on the coarsest
    level + FPN fusion over all levels."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    channels: int = 512
    num_classes: int = 19
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dropout_ratio: float = 0.1
    in_index: Sequence[int] = (0, 1, 2, 3)
    align_corners: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        feats = [inputs[i] for i in self.in_index]
        # PPM on the last level
        top = feats[-1]
        h, w = top.shape[-3], top.shape[-2]
        ppm_outs = [top]
        for i, scale in enumerate(self.pool_scales):
            y = adaptive_avg_pool(top, scale)
            y = ConvModule(self.channels, 1, name=f"ppm{i}")(y, train=train)
            ppm_outs.append(resize_bilinear(y, (h, w),
                                            align_corners=self.align_corners))
        laterals = [ConvModule(self.channels, 1, name=f"lateral{i}")(f,
                                                                     train=train)
                    for i, f in enumerate(feats[:-1])]
        laterals.append(ConvModule(self.channels, 3, padding=1,
                                   name="ppm_bottleneck")(
            jnp.concatenate(ppm_outs, axis=-1), train=train))
        # top-down fusion
        for i in range(len(laterals) - 2, -1, -1):
            hw = (laterals[i].shape[-3], laterals[i].shape[-2])
            laterals[i] = laterals[i] + resize_bilinear(
                laterals[i + 1], hw, align_corners=self.align_corners)
        fpn_outs = [ConvModule(self.channels, 3, padding=1,
                               name=f"fpn_conv{i}")(laterals[i], train=train)
                    for i in range(len(laterals) - 1)]
        fpn_outs.append(laterals[-1])
        hw0 = (fpn_outs[0].shape[-3], fpn_outs[0].shape[-2])
        fused = jnp.concatenate(
            [resize_bilinear(f, hw0, align_corners=self.align_corners)
             for f in fpn_outs], axis=-1)
        out = ConvModule(self.channels, 3, padding=1,
                         name="fpn_bottleneck")(fused, train=train)
        return self.cls_seg(out, train)


@HEADS.register()
class SegFormerHead(nn.Module, DecodeHeadMixin):
    """All-MLP decode head (segformer_head.py): per-level linear projection,
    upsample to the finest level, concat, fuse."""
    in_channels: Sequence[int] = (32, 64, 160, 256)
    channels: int = 256
    num_classes: int = 19
    dropout_ratio: float = 0.1
    in_index: Sequence[int] = (0, 1, 2, 3)
    align_corners: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        feats = [inputs[i] for i in self.in_index]
        hw0 = (feats[0].shape[-3], feats[0].shape[-2])
        projected = []
        for i, f in enumerate(feats):
            y = nn.Dense(self.channels, name=f"linear{i}")(f)
            projected.append(resize_bilinear(
                y, hw0, align_corners=self.align_corners))
        fused = ConvModule(self.channels, 1, name="fuse")(
            jnp.concatenate(projected, axis=-1), train=train)
        return self.cls_seg(fused, train)


@HEADS.register()
class DepthwiseSeparableASPPHead(nn.Module, DecodeHeadMixin):
    """DeepLabV3+ head (sep_aspp_head.py): ASPP + low-level skip fusion."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    dilations: Sequence[int] = (1, 12, 24, 36)
    c1_in_channels: int = 256
    c1_channels: int = 48
    c1_index: int = 0
    dropout_ratio: float = 0.1
    in_index: int = 3
    align_corners: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs[self.in_index]
        h, w = x.shape[-3], x.shape[-2]
        img = adaptive_avg_pool(x, 1)
        img = ConvModule(self.channels, 1, name="image_pool_conv")(img,
                                                                   train=train)
        img = resize_bilinear(img, (h, w), align_corners=self.align_corners)
        outs = [img]
        for i, d in enumerate(self.dilations):
            k = 1 if d == 1 else 3
            pad = 0 if d == 1 else d
            outs.append(ConvModule(self.channels, k, padding=pad, dilation=d,
                                   name=f"aspp{i}")(x, train=train))
        feats = ConvModule(self.channels, 3, padding=1, name="bottleneck")(
            jnp.concatenate(outs, axis=-1), train=train)

        c1 = ConvModule(self.c1_channels, 1, name="c1_bottleneck")(
            inputs[self.c1_index], train=train)
        hw1 = (c1.shape[-3], c1.shape[-2])
        feats = resize_bilinear(feats, hw1, align_corners=self.align_corners)
        feats = jnp.concatenate([feats, c1], axis=-1)
        feats = ConvModule(self.channels, 3, padding=1,
                           name="sep_conv0")(feats, train=train)
        feats = ConvModule(self.channels, 3, padding=1,
                           name="sep_conv1")(feats, train=train)
        return self.cls_seg(feats, train)


@HEADS.register()
class OCRHead(nn.Module, DecodeHeadMixin):
    """Object-Contextual Representations head (ocr_head.py): soft object
    regions from a prior head's logits gather class centroids; pixels attend
    over them.  Cascade-style: __call__ takes (inputs, prev_logits)."""
    in_channels: int = 2048
    channels: int = 512
    ocr_channels: int = 256
    num_classes: int = 19
    dropout_ratio: float = 0.1
    in_index: int = 3
    align_corners: bool = False
    scale: float = 1.0

    @nn.compact
    def __call__(self, inputs, prev_logits=None, train: bool = False):
        x = inputs[self.in_index]
        b, h, w, _ = x.shape
        feats = ConvModule(self.channels, 3, padding=1,
                           name="bottleneck")(x, train=train)
        if prev_logits is None:
            prev_logits = ConvModule(self.num_classes, 1, with_norm=False,
                                     with_act=False,
                                     name="soft_regions")(feats, train=train)
        probs = nn.softmax(prev_logits.reshape(b, h * w, -1) * self.scale,
                           axis=1)                      # (B, HW, K)
        pixels = feats.reshape(b, h * w, self.channels)
        # class centroids: weighted average of pixel features
        context = jnp.einsum("bpk,bpc->bkc", probs, pixels)

        # pixel-to-region attention (self_attention_block equivalent)
        query = nn.Dense(self.ocr_channels, name="query")(pixels)
        key = nn.Dense(self.ocr_channels, name="key")(context)
        value = nn.Dense(self.ocr_channels, name="value")(context)
        sim = jnp.einsum("bpc,bkc->bpk", query, key) / jnp.sqrt(
            float(self.ocr_channels))
        attn = nn.softmax(sim, axis=-1)
        ocr = jnp.einsum("bpk,bkc->bpc", attn, value)
        ocr = nn.Dense(self.channels, name="up_proj")(ocr)
        out = jnp.concatenate([pixels, ocr], axis=-1).reshape(
            b, h, w, 2 * self.channels)
        out = ConvModule(self.channels, 1, name="fuse")(out, train=train)
        return self.cls_seg(out, train)


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
