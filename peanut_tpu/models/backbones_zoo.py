"""Zoo backbones beyond PEANUT's path (flax.linen, NHWC).

Structural re-implementations of the reference's remaining mmseg 0.26
backbone families (prediction/mmseg/models/backbones/): resnest, mobilenet_v3,
fast_scnn, cgnet, erfnet, bisenetv1, bisenetv2, stdc, icnet, twins (PCPVT/SVT),
beit, mae.  (ResNeXt lives in resnet.py as a grouped-conv ResNet; ViT/Swin/
MiT/HRNet/UNet/MobileNetV2 are in their own modules.)

Like the zoo heads, the bar here is structural + functional parity
(SURVEY.md §2.2 "rest = zoo"); all blocks are standard conv/attention
compositions that XLA fuses onto the MXU without custom kernels.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..registry import BACKBONES
from .layers import ConvModule, Conv2d, BatchNorm, max_pool_torch
from .ops import resize_bilinear, adaptive_avg_pool
from .resnet import Bottleneck
from .mobilenet import InvertedResidual, relu6


def hswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class SELayer(nn.Module):
    """Squeeze-excitation with configurable gate (mmcv se_layer.py)."""
    ratio: int = 4
    gate: str = "hsigmoid"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.relu(Conv2d(max(c // self.ratio, 1), 1, name="fc1")(s))
        s = Conv2d(c, 1, name="fc2")(s)
        s = hsigmoid(s) if self.gate == "hsigmoid" else nn.sigmoid(s)
        return x * s


# ---------------------------------------------------------------------------
# ResNeSt
# ---------------------------------------------------------------------------


class SplitAttentionConv(nn.Module):
    """Split-attention grouped conv (resnest.py SplitAttentionConv2d)."""
    channels: int
    radix: int = 2
    groups: int = 1
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        r, c = self.radix, self.channels
        y = Conv2d(c * r, 3, stride=self.stride, padding=self.dilation,
                   dilation=self.dilation, groups=self.groups * r,
                   use_bias=False, name="conv")(x)
        y = BatchNorm(name="bn0")(y, train=train)
        y = nn.relu(y)
        b, h, w, _ = y.shape
        splits = y.reshape(b, h, w, r, c)
        gap = jnp.mean(splits.sum(axis=3), axis=(1, 2), keepdims=True)
        inter = max(c * r // 4, 32)
        gap = ConvModule(inter, 1, name="fc1")(gap, train=train)
        atten = Conv2d(c * r, 1, name="fc2")(gap).reshape(b, 1, 1, r, c)
        atten = nn.softmax(atten, axis=3)  # rsoftmax over radix
        return (splits * atten).sum(axis=3)


class ResNeStBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    radix: int = 2
    avg_down_stride: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = Conv2d(self.planes, 1, use_bias=False, name="conv1")(x)
        out = BatchNorm(name="bn1")(out, train=train)
        out = nn.relu(out)
        if self.avg_down_stride and self.stride > 1:
            out = nn.avg_pool(out, (3, 3), strides=(self.stride,) * 2,
                              padding=((1, 1), (1, 1)))
            sa_stride = 1
        else:
            sa_stride = self.stride
        out = SplitAttentionConv(self.planes, radix=self.radix,
                                 stride=sa_stride, dilation=self.dilation,
                                 name="conv2")(out, train=train)
        out = Conv2d(self.planes * 4, 1, use_bias=False, name="conv3")(out)
        out = BatchNorm(name="bn3")(out, train=train)
        if self.downsample:
            if self.stride > 1:  # avg_down shortcut
                identity = nn.avg_pool(identity, (self.stride,) * 2,
                                       strides=(self.stride,) * 2)
            identity = Conv2d(self.planes * 4, 1, use_bias=False,
                              name="downsample_conv")(identity)
            identity = BatchNorm(name="downsample_bn")(identity, train=train)
        return nn.relu(out + identity)


RESNEST_ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 200: (3, 24, 36, 3)}


@BACKBONES.register()
class ResNeSt(nn.Module):
    """ResNeSt (resnest.py): split-attention bottlenecks, deep stem,
    avg-down shortcuts."""
    depth: int = 50
    in_channels: int = 3
    stem_channels: int = 64
    base_channels: int = 64
    radix: int = 2
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    contract_dilation: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvModule(self.stem_channels // 2, 3, stride=2, padding=1,
                       name="stem0")(x, train=train)
        x = ConvModule(self.stem_channels // 2, 3, padding=1,
                       name="stem1")(x, train=train)
        x = ConvModule(self.stem_channels, 3, padding=1,
                       name="stem2")(x, train=train)
        x = max_pool_torch(x, 3, 2, 1)
        outs = []
        for i in range(self.num_stages):
            planes = self.base_channels * 2 ** i
            for j in range(RESNEST_ARCH[self.depth][i]):
                first = j == 0
                d = self.dilations[i]
                if first and d > 1 and self.contract_dilation:
                    d = d // 2
                x = ResNeStBottleneck(
                    planes=planes,
                    stride=self.strides[i] if first else 1,
                    dilation=d,
                    downsample=first and (self.strides[i] != 1
                                          or x.shape[-1] != planes * 4),
                    radix=self.radix,
                    name=f"layer{i + 1}_{j}")(x, train=train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


# ---------------------------------------------------------------------------
# MobileNetV3
# ---------------------------------------------------------------------------

# kernel, expand_ch, out_ch, use_se, act, stride
MBV3_ARCH = {
    "small": [
        (3, 16, 16, True, "relu", 2), (3, 72, 24, False, "relu", 2),
        (3, 88, 24, False, "relu", 1), (5, 96, 40, True, "hswish", 2),
        (5, 240, 40, True, "hswish", 1), (5, 240, 40, True, "hswish", 1),
        (5, 120, 48, True, "hswish", 1), (5, 144, 48, True, "hswish", 1),
        (5, 288, 96, True, "hswish", 2), (5, 576, 96, True, "hswish", 1),
        (5, 576, 96, True, "hswish", 1)],
    "large": [
        (3, 16, 16, False, "relu", 1), (3, 64, 24, False, "relu", 2),
        (3, 72, 24, False, "relu", 1), (5, 72, 40, True, "relu", 2),
        (5, 120, 40, True, "relu", 1), (5, 120, 40, True, "relu", 1),
        (3, 240, 80, False, "hswish", 2), (3, 200, 80, False, "hswish", 1),
        (3, 184, 80, False, "hswish", 1), (3, 184, 80, False, "hswish", 1),
        (3, 480, 112, True, "hswish", 1), (3, 672, 112, True, "hswish", 1),
        (5, 672, 160, True, "hswish", 2), (5, 960, 160, True, "hswish", 1),
        (5, 960, 160, True, "hswish", 1)],
}


class MBV3Block(nn.Module):
    kernel: int
    expand: int
    out_channels: int
    use_se: bool
    act: str
    stride: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = hswish if self.act == "hswish" else nn.relu
        cin = x.shape[-1]
        identity = x
        y = x
        if self.expand != cin:
            y = ConvModule(self.expand, 1, act=act, name="expand")(y,
                                                                   train=train)
        pad = (self.kernel // 2) * self.dilation
        y = nn.Conv(self.expand, (self.kernel,) * 2,
                    strides=(self.stride,) * 2, padding=((pad, pad),) * 2,
                    kernel_dilation=(self.dilation,) * 2,
                    feature_group_count=self.expand, use_bias=False,
                    name="dw")(y)
        y = BatchNorm(name="dw_bn")(y, train=train)
        y = act(y)
        if self.use_se:
            y = SELayer(name="se")(y)
        y = Conv2d(self.out_channels, 1, use_bias=False, name="project")(y)
        y = BatchNorm(name="project_bn")(y, train=train)
        if self.stride == 1 and cin == self.out_channels:
            y = y + identity
        return y


@BACKBONES.register()
class MobileNetV3(nn.Module):
    """MobileNetV3 (mobilenet_v3.py): small/large arch with SE + h-swish;
    the final stride-2 stages dilated for segmentation."""
    arch: str = "large"
    out_indices: Sequence[int] = (1, 3, 16)
    dilate_last: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        stem_act = hswish
        x = ConvModule(16, 3, stride=2, padding=1, act=stem_act,
                       name="layer0")(x, train=train)
        if 0 in self.out_indices:
            outs.append(x)
        arch = MBV3_ARCH[self.arch]
        n = len(arch)
        for i, (k, e, c, se, act, s) in enumerate(arch):
            dilation = 1
            if self.dilate_last and i >= n - 3 and s == 2:
                s, dilation = 1, 2
            x = MBV3Block(k, e, c, se, act, s, dilation,
                          name=f"layer{i + 1}")(x, train=train)
            if i + 1 in self.out_indices:
                outs.append(x)
        final_ch = 576 if self.arch == "small" else 960
        x = ConvModule(final_ch, 1, act=hswish,
                       name=f"layer{n + 1}")(x, train=train)
        if n + 1 in self.out_indices:
            outs.append(x)
        return tuple(outs)


# ---------------------------------------------------------------------------
# Fast-SCNN
# ---------------------------------------------------------------------------


class _DSConv(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.Conv(c, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), feature_group_count=c,
                    use_bias=False, name="dw")(x)
        y = BatchNorm(name="dw_bn")(y, train=train)
        y = nn.relu(y)
        return ConvModule(self.features, 1, name="pw")(y, train=train)


@BACKBONES.register()
class FastSCNN(nn.Module):
    """Fast-SCNN (fast_scnn.py): learning-to-downsample, global feature
    extractor with PPM, and feature fusion.  Returns (higher_res_1/8,
    lower_res_1/32, fusion_1/8) for (aux, aux, decode) heads."""
    downsample_dw_channels: Sequence[int] = (32, 48)
    global_in_channels: int = 64
    global_block_channels: Sequence[int] = (64, 96, 128)
    global_block_strides: Sequence[int] = (2, 2, 1)
    global_out_channels: int = 128
    fusion_out_channels: int = 128
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    align_corners: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # learning to downsample -> 1/8
        x = ConvModule(self.downsample_dw_channels[0], 3, stride=2, padding=1,
                       name="ltd_conv")(x, train=train)
        x = _DSConv(self.downsample_dw_channels[1], stride=2,
                    name="ltd_ds0")(x, train=train)
        higher = _DSConv(self.global_in_channels, stride=2,
                         name="ltd_ds1")(x, train=train)
        # global feature extractor -> 1/32 (+PPM)
        y = higher
        for i, (c, s) in enumerate(zip(self.global_block_channels,
                                       self.global_block_strides)):
            for j in range(3):
                y = InvertedResidual(c, stride=s if j == 0 else 1,
                                     expand_ratio=6,
                                     name=f"gfe{i}_{j}")(y, train=train)
        h, w = y.shape[-3], y.shape[-2]
        ppm = [y]
        for i, sc in enumerate(self.pool_scales):
            p = ConvModule(self.global_out_channels // 4, 1,
                           name=f"ppm{i}")(adaptive_avg_pool(y, sc),
                                           train=train)
            ppm.append(resize_bilinear(p, (h, w),
                                       align_corners=self.align_corners))
        lower = ConvModule(self.global_out_channels, 3, padding=1,
                           name="ppm_bottleneck")(
            jnp.concatenate(ppm, axis=-1), train=train)
        # feature fusion -> 1/8
        up = resize_bilinear(lower, (higher.shape[-3], higher.shape[-2]),
                             align_corners=self.align_corners)
        up = nn.Conv(up.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                     feature_group_count=up.shape[-1], use_bias=False,
                     name="ffm_dw")(up)
        up = BatchNorm(name="ffm_dw_bn")(up, train=train)
        up = ConvModule(self.fusion_out_channels, 1, with_act=False,
                        name="ffm_low_proj")(nn.relu(up), train=train)
        hi = ConvModule(self.fusion_out_channels, 1, with_act=False,
                        name="ffm_high_proj")(higher, train=train)
        fusion = nn.relu(up + hi)
        return higher, lower, fusion


# ---------------------------------------------------------------------------
# CGNet
# ---------------------------------------------------------------------------


class ContextGuidedBlock(nn.Module):
    """CG block (cgnet.py): local + dilated surrounding context, joint
    BN+PReLU, global-context channel gate."""
    out_channels: int
    dilation: int = 2
    reduction: int = 16
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.out_channels // 2 if not self.downsample \
            else self.out_channels
        if self.downsample:
            y = ConvModule(half, 3, stride=2, padding=1,
                           act=lambda t: nn.PReLU()(t),
                           name="conv1x1")(x, train=train)
        else:
            y = ConvModule(half, 1, act=lambda t: nn.PReLU()(t),
                           name="conv1x1")(x, train=train)
        loc = nn.Conv(half, (3, 3), padding=((1, 1), (1, 1)),
                      feature_group_count=half, use_bias=False,
                      name="f_loc")(y)
        sur = nn.Conv(half, (3, 3),
                      padding=((self.dilation,) * 2, (self.dilation,) * 2),
                      kernel_dilation=(self.dilation,) * 2,
                      feature_group_count=half, use_bias=False,
                      name="f_sur")(y)
        joi = jnp.concatenate([loc, sur], axis=-1)
        joi = BatchNorm(name="bn")(joi, train=train)
        joi = nn.PReLU(name="activate")(joi)
        if self.downsample:
            joi = Conv2d(self.out_channels, 1, use_bias=False,
                         name="bottleneck")(joi)
        # global context gate
        g = jnp.mean(joi, axis=(-3, -2))
        g = nn.relu(nn.Dense(max(joi.shape[-1] // self.reduction, 1),
                             name="fc1")(g))
        g = nn.sigmoid(nn.Dense(joi.shape[-1], name="fc2")(g))
        joi = joi * g[:, None, None, :]
        if not self.downsample and x.shape[-1] == joi.shape[-1]:
            joi = joi + x
        return joi


@BACKBONES.register()
class CGNet(nn.Module):
    """CGNet (cgnet.py): 3 stages of context-guided blocks with input
    injection; returns one feature per stage."""
    in_channels: int = 3
    num_channels: Sequence[int] = (32, 64, 128)
    num_blocks: Sequence[int] = (3, 21)
    dilations: Sequence[int] = (2, 4)
    reductions: Sequence[int] = (8, 16)

    @nn.compact
    def __call__(self, x, train: bool = False):
        img = x
        y = x
        for i in range(3):
            y = ConvModule(self.num_channels[0], 3,
                           stride=2 if i == 0 else 1, padding=1,
                           act=lambda t: nn.PReLU()(t),
                           name=f"stem{i}")(y, train=train)
        inj1 = nn.avg_pool(img, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))
        y = jnp.concatenate([y, inj1], axis=-1)
        outs = [y]
        for s in range(2):
            down = None
            for j in range(self.num_blocks[s]):
                y = ContextGuidedBlock(
                    self.num_channels[s + 1], dilation=self.dilations[s],
                    reduction=self.reductions[s], downsample=(j == 0),
                    name=f"level{s + 1}_{j}")(y, train=train)
                if j == 0:
                    down = y
            # stage output = concat(first block, last block [, injected input])
            cat = [y, down]
            if s == 0:
                cat.append(resize_bilinear(inj1, (y.shape[-3], y.shape[-2])))
            y = jnp.concatenate(cat, axis=-1)
            outs.append(y)
        return tuple(outs)


# ---------------------------------------------------------------------------
# ERFNet
# ---------------------------------------------------------------------------


class _Downsampler(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = Conv2d(self.features - x.shape[-1], 3, stride=2, padding=1,
                      name="conv")(x)
        pool = max_pool_torch(x, 2, 2, 0)
        y = jnp.concatenate([conv, pool], axis=-1)
        y = BatchNorm(name="bn")(y, train=train)
        return nn.relu(y)


class _NonBottleneck1d(nn.Module):
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        d = self.dilation
        y = nn.relu(Conv2d(c, (3, 1), padding=(1, 0), name="conv3x1_1")(x))
        y = Conv2d(c, (1, 3), padding=(0, 1), name="conv1x3_1")(y)
        y = nn.relu(BatchNorm(name="bn1")(y, train=train))
        y = nn.relu(Conv2d(c, (3, 1), padding=(d, 0), dilation=(d, 1),
                           name="conv3x1_2")(y))
        y = Conv2d(c, (1, 3), padding=(0, d), dilation=(1, d),
                   name="conv1x3_2")(y)
        y = BatchNorm(name="bn2")(y, train=train)
        return nn.relu(y + x)


@BACKBONES.register()
class ERFNet(nn.Module):
    """ERFNet (erfnet.py): downsampler + factorized non-bottleneck-1d
    encoder, deconv-style decoder; returns the decoder feature (1/2 res)."""
    enc_downsample_channels: Sequence[int] = (16, 64, 128)
    enc_stage_non_bottlenecks: Sequence[int] = (5, 8)
    dilations: Sequence[int] = (2, 4, 8, 16)
    dec_upsample_channels: Sequence[int] = (64, 16)
    dec_stages_non_bottleneck: Sequence[int] = (2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _Downsampler(self.enc_downsample_channels[0],
                         name="down0")(x, train=train)
        y = _Downsampler(self.enc_downsample_channels[1],
                         name="down1")(y, train=train)
        for i in range(self.enc_stage_non_bottlenecks[0]):
            y = _NonBottleneck1d(name=f"enc1_{i}")(y, train=train)
        y = _Downsampler(self.enc_downsample_channels[2],
                         name="down2")(y, train=train)
        for i in range(self.enc_stage_non_bottlenecks[1]):
            d = self.dilations[i % len(self.dilations)]
            y = _NonBottleneck1d(dilation=d, name=f"enc2_{i}")(y, train=train)
        # decoder: 2x upsample convs + non-bottleneck blocks
        for s, c in enumerate(self.dec_upsample_channels):
            y = resize_bilinear(y, (y.shape[-3] * 2, y.shape[-2] * 2))
            y = ConvModule(c, 3, padding=1, name=f"up{s}")(y, train=train)
            for i in range(self.dec_stages_non_bottleneck[s]):
                y = _NonBottleneck1d(name=f"dec{s}_{i}")(y, train=train)
        return (y,)


# ---------------------------------------------------------------------------
# BiSeNet V1 / V2
# ---------------------------------------------------------------------------


class _ARM(nn.Module):
    """Attention refinement module (bisenetv1.py)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvModule(self.features, 3, padding=1, name="conv")(x,
                                                                 train=train)
        g = ConvModule(self.features, 1, with_act=False, name="gate")(
            jnp.mean(y, axis=(-3, -2), keepdims=True), train=train)
        return y * nn.sigmoid(g)


@BACKBONES.register()
class BiSeNetV1(nn.Module):
    """BiSeNet V1 (bisenetv1.py): spatial path + context path over a host
    backbone with ARM refinement and FFM fusion.  Returns
    (ffm_out, context_8x_down, context_16x_down) for decode + 2 aux heads."""
    backbone_cfg: dict = None
    spatial_channels: Sequence[int] = (64, 64, 64, 128)
    context_channels: Sequence[int] = (128, 256, 512)
    out_channels: int = 256
    align_corners: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # spatial path: 1/8 resolution
        sp = x
        for i, c in enumerate(self.spatial_channels):
            k, s, p = (7, 2, 3) if i == 0 else (3, 2, 1)
            if i == len(self.spatial_channels) - 1:
                k, s, p = 1, 1, 0
            sp = ConvModule(c, k, stride=s, padding=p,
                            name=f"spatial{i}")(sp, train=train)
        # context path over the host backbone
        bcfg = dict(self.backbone_cfg or dict(type="ResNet", depth=18))
        host = BACKBONES.get(bcfg.pop("type"))(**bcfg, name="context_backbone")
        feats = host(x, train=train)
        c16, c32 = feats[-2], feats[-1]
        gap = ConvModule(self.context_channels[0], 1, name="gap_conv")(
            jnp.mean(c32, axis=(-3, -2), keepdims=True), train=train)
        a32 = _ARM(self.context_channels[0], name="arm32")(c32, train=train)
        a32 = a32 + gap
        a32 = resize_bilinear(a32, (c16.shape[-3], c16.shape[-2]),
                              align_corners=self.align_corners)
        a32 = ConvModule(self.context_channels[0], 3, padding=1,
                         name="refine32")(a32, train=train)
        a16 = _ARM(self.context_channels[0], name="arm16")(c16, train=train)
        a16 = a16 + a32
        a16 = resize_bilinear(a16, (sp.shape[-3], sp.shape[-2]),
                              align_corners=self.align_corners)
        a16 = ConvModule(self.context_channels[0], 3, padding=1,
                         name="refine16")(a16, train=train)
        # feature fusion module
        cat = jnp.concatenate([sp, a16], axis=-1)
        fused = ConvModule(self.out_channels, 1, name="ffm_conv")(cat,
                                                                  train=train)
        g = jnp.mean(fused, axis=(-3, -2), keepdims=True)
        g = nn.relu(Conv2d(self.out_channels // 4, 1, name="ffm_fc1")(g))
        g = nn.sigmoid(Conv2d(self.out_channels, 1, name="ffm_fc2")(g))
        out = fused + fused * g
        return out, a16, a32


class _GELayer(nn.Module):
    """Gather-and-expand layer (bisenetv2.py)."""
    features: int
    stride: int = 1
    expand: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        mid = cin * self.expand
        y = ConvModule(cin, 3, padding=1, name="conv1")(x, train=train)
        y = nn.Conv(mid, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), feature_group_count=cin,
                    use_bias=False, name="dw1")(y)
        y = BatchNorm(name="dw1_bn")(y, train=train)
        if self.stride == 2:
            y = nn.Conv(mid, (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=mid, use_bias=False,
                        name="dw2")(nn.relu(y))
            y = BatchNorm(name="dw2_bn")(y, train=train)
        y = nn.relu(y)
        y = Conv2d(self.features, 1, use_bias=False, name="project")(y)
        y = BatchNorm(name="project_bn")(y, train=train)
        if self.stride == 2:
            sc = nn.Conv(cin, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                         feature_group_count=cin, use_bias=False,
                         name="short_dw")(x)
            sc = BatchNorm(name="short_dw_bn")(sc, train=train)
            sc = Conv2d(self.features, 1, use_bias=False, name="short_pw")(sc)
            sc = BatchNorm(name="short_pw_bn")(sc, train=train)
            x = sc
        return nn.relu(y + x)


@BACKBONES.register()
class BiSeNetV2(nn.Module):
    """BiSeNet V2 (bisenetv2.py): detail branch + semantic branch with
    stem/GE/CE blocks, bilateral guided aggregation.  Returns
    (bga_out, stem, s3, s4, s5) — decode + 4 aux taps."""
    detail_channels: Sequence[int] = (64, 64, 128)
    semantic_channels: Sequence[int] = (16, 32, 64, 128)
    semantic_expansion: int = 6
    bga_channels: int = 128
    align_corners: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # detail branch -> 1/8
        d = x
        for i, c in enumerate(self.detail_channels):
            d = ConvModule(c, 3, stride=2, padding=1,
                           name=f"detail{i}_down")(d, train=train)
            d = ConvModule(c, 3, padding=1,
                           name=f"detail{i}_conv")(d, train=train)
        # semantic branch: stem -> 1/4
        s = ConvModule(self.semantic_channels[0], 3, stride=2, padding=1,
                       name="stem_conv")(x, train=train)
        left = ConvModule(self.semantic_channels[0] // 2, 1,
                          name="stem_l0")(s, train=train)
        left = ConvModule(self.semantic_channels[0], 3, stride=2, padding=1,
                          name="stem_l1")(left, train=train)
        right = max_pool_torch(s, 3, 2, 1)
        s = ConvModule(self.semantic_channels[0], 3, padding=1,
                       name="stem_fuse")(
            jnp.concatenate([left, right], axis=-1), train=train)
        stem_out = s
        taps = []
        for i, c in enumerate(self.semantic_channels[1:]):
            n_blocks = 4 if i == len(self.semantic_channels) - 2 else 2
            for j in range(n_blocks):
                s = _GELayer(c, stride=2 if j == 0 else 1,
                             expand=self.semantic_expansion,
                             name=f"ge{i}_{j}")(s, train=train)
            taps.append(s)
        # context embedding
        ce = jnp.mean(s, axis=(-3, -2), keepdims=True)
        ce = BatchNorm(name="ce_bn")(ce, train=train)
        ce = ConvModule(self.semantic_channels[-1], 1,
                        name="ce_conv")(ce, train=train)
        s = s + ce
        s = ConvModule(self.semantic_channels[-1], 3, padding=1,
                       name="ce_out")(s, train=train)
        # bilateral guided aggregation
        hw_d = (d.shape[-3], d.shape[-2])
        d_dw = nn.Conv(d.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                       feature_group_count=d.shape[-1], use_bias=False,
                       name="bga_d_dw")(d)
        d_dw = Conv2d(self.bga_channels, 1, name="bga_d_pw")(
            BatchNorm(name="bga_d_bn")(d_dw, train=train))
        d_down = ConvModule(self.bga_channels, 3, stride=2, padding=1,
                            with_act=False, name="bga_d_down")(d, train=train)
        d_down = nn.avg_pool(d_down, (3, 3), strides=(2, 2),
                             padding=((1, 1), (1, 1)))
        s_conv = ConvModule(self.bga_channels, 3, padding=1, with_act=False,
                            name="bga_s_conv")(s, train=train)
        s_up = resize_bilinear(s_conv, hw_d,
                               align_corners=self.align_corners)
        s_dw = nn.Conv(s.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                       feature_group_count=s.shape[-1], use_bias=False,
                       name="bga_s_dw")(s)
        s_dw = Conv2d(self.bga_channels, 1, name="bga_s_pw")(
            BatchNorm(name="bga_s_bn")(s_dw, train=train))
        left = d_dw * nn.sigmoid(s_up)
        right = d_down * nn.sigmoid(s_dw)
        right = resize_bilinear(right, hw_d,
                                align_corners=self.align_corners)
        out = ConvModule(self.bga_channels, 3, padding=1,
                         name="bga_out")(left + right, train=train)
        return (out, stem_out) + tuple(taps)


# ---------------------------------------------------------------------------
# STDC
# ---------------------------------------------------------------------------


class STDCModule(nn.Module):
    """Short-Term Dense Concatenate module (stdc.py): progressive-width
    convs concatenated; stride-2 variant pools the first branch."""
    features: int
    stride: int = 1
    num_convs: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        y = ConvModule(self.features // 2, 1, name="conv0")(x, train=train)
        if self.stride == 2:
            # mmseg 'cat' fusion (stdc.py:50-58,117-127): branch 0 is
            # avg-pooled x0; the conv chain runs on a depthwise stride-2
            # downsample of x0 (conv+bn, no act), conv1 itself stride 1
            outs.append(nn.avg_pool(y, (3, 3), strides=(2, 2),
                                    padding=((1, 1), (1, 1))))
            y = ConvModule(self.features // 2, 3, stride=2, padding=1,
                           groups=self.features // 2, with_act=False,
                           name="downsample")(y, train=train)
            y = ConvModule(self.features // 4, 3, padding=1,
                           name="conv1")(y, train=train)
        else:
            outs.append(y)
            y = ConvModule(self.features // 4, 3, padding=1,
                           name="conv1")(y, train=train)
        outs.append(y)
        frac = 8
        for i in range(2, self.num_convs):
            c = self.features // frac
            if i == self.num_convs - 1:
                c = self.features - sum(o.shape[-1] for o in outs[1:]) \
                    - outs[0].shape[-1]
            y = ConvModule(c, 3, padding=1,
                           name=f"conv{i}")(y, train=train)
            outs.append(y)
            frac *= 2
        return jnp.concatenate(outs, axis=-1)


@BACKBONES.register()
class STDCNet(nn.Module):
    """STDC backbone (stdc.py STDCNet): conv stem + 3 STDC stages."""
    stdc_type: str = "STDCNet1"
    channels: Sequence[int] = (32, 64, 256, 512, 1024)
    bottleneck_type: str = "cat"
    num_convs: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3, 4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # mmseg stdc.py arch_settings: STDCNet1 = 2 modules/stage,
        # STDCNet2 = (4, 5, 3); first module of each stage strides 2
        num_modules = (2, 2, 2) if self.stdc_type == "STDCNet1" else (4, 5, 3)
        outs = []
        x = ConvModule(self.channels[0], 3, stride=2, padding=1,
                       name="stem0")(x, train=train)
        if 0 in self.out_indices:
            outs.append(x)
        x = ConvModule(self.channels[1], 3, stride=2, padding=1,
                       name="stem1")(x, train=train)
        if 1 in self.out_indices:
            outs.append(x)
        for s in range(3):
            for j in range(num_modules[s]):
                x = STDCModule(self.channels[s + 2],
                               stride=2 if j == 0 else 1,
                               num_convs=self.num_convs,
                               name=f"stage{s + 2}_{j}")(x, train=train)
            if s + 2 in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register()
class STDCContextPathNet(nn.Module):
    """STDC context path (stdc.py STDCContextPathNet): STDCNet + BiSeNet-style
    ARM refinement and FFM; returns (ffm, arm16_up, arm32_up, stage-1/8)
    for decode + aux + detail heads."""
    backbone_cfg: dict = None
    last_in_channels: Sequence[int] = (1024, 512)
    out_channels: int = 128
    ffm_channels: int = 256
    align_corners: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        bcfg = dict(self.backbone_cfg or dict(type="STDCNet"))
        host = BACKBONES.get(bcfg.pop("type"))(**bcfg, name="backbone")
        feats = host(x, train=train)
        f8, f16, f32 = feats[-3], feats[-2], feats[-1]
        gap = ConvModule(self.out_channels, 1, name="gap_conv")(
            jnp.mean(f32, axis=(-3, -2), keepdims=True), train=train)
        a32 = _ARM(self.out_channels, name="arm32")(f32, train=train) + gap
        a32 = resize_bilinear(a32, (f16.shape[-3], f16.shape[-2]),
                              align_corners=self.align_corners)
        a32 = ConvModule(self.out_channels, 3, padding=1,
                         name="refine32")(a32, train=train)
        a16 = _ARM(self.out_channels, name="arm16")(f16, train=train) + a32
        a16 = resize_bilinear(a16, (f8.shape[-3], f8.shape[-2]),
                              align_corners=self.align_corners)
        a16 = ConvModule(self.out_channels, 3, padding=1,
                         name="refine16")(a16, train=train)
        cat = jnp.concatenate([f8, a16], axis=-1)
        fused = ConvModule(self.ffm_channels, 1, name="ffm_conv")(cat,
                                                                  train=train)
        g = jnp.mean(fused, axis=(-3, -2), keepdims=True)
        g = nn.relu(Conv2d(self.ffm_channels // 4, 1, name="ffm_fc1")(g))
        g = nn.sigmoid(Conv2d(self.ffm_channels, 1, name="ffm_fc2")(g))
        out = fused + fused * g
        return out, a16, a32, f8


# ---------------------------------------------------------------------------
# ICNet
# ---------------------------------------------------------------------------


@BACKBONES.register()
class ICNet(nn.Module):
    """ICNet backbone (icnet.py): three resolution branches — light convs at
    full res, shared dilated-ResNet stages at 1/2 and 1/4 — plus PPM on the
    coarsest.  Returns (sub1, sub2, sub4) for ICNeck."""
    layer_channels: Sequence[int] = (64, 128)  # (sub2 planes, base)
    light_branch_mid_channels: int = 32
    psp_out_channels: int = 512
    out_channels: Sequence[int] = (64, 256, 256)
    depth_blocks: Sequence[int] = (3, 4, 6, 3)  # resnet50-style
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    align_corners: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # sub1: full-res light branch -> 1/8
        y = x
        for i, c in enumerate((self.light_branch_mid_channels,
                               self.light_branch_mid_channels,
                               self.out_channels[0])):
            y = ConvModule(c, 3, stride=2, padding=1,
                           name=f"sub1_{i}")(y, train=train)
        sub1 = y

        # sub2: half-res, resnet stem + stages 1-2 (shared trunk)
        h2 = resize_bilinear(x, (x.shape[-3] // 2, x.shape[-2] // 2),
                             align_corners=self.align_corners)
        z = ConvModule(32, 3, stride=2, padding=1, name="stem0")(h2,
                                                                 train=train)
        z = ConvModule(32, 3, padding=1, name="stem1")(z, train=train)
        z = ConvModule(64, 3, padding=1, name="stem2")(z, train=train)
        z = max_pool_torch(z, 3, 2, 1)
        planes = (64, 128, 256, 512)
        for i in range(2):
            for j in range(self.depth_blocks[i]):
                first = j == 0
                z = Bottleneck(planes[i], stride=2 if (first and i == 1)
                               else 1,
                               downsample=first,
                               name=f"layer{i + 1}_{j}")(z, train=train)
        sub2 = ConvModule(self.out_channels[1], 1,
                          name="sub2_proj")(z, train=train)

        # sub4: quarter-res continuation, dilated stages 3-4 + PPM
        w = resize_bilinear(z, (max(z.shape[-3] // 2, 1),
                                max(z.shape[-2] // 2, 1)),
                            align_corners=self.align_corners)
        for i in range(2, 4):
            d = 2 if i == 2 else 4
            for j in range(self.depth_blocks[i]):
                w = Bottleneck(planes[i], dilation=d, downsample=(j == 0),
                               name=f"layer{i + 1}_{j}")(w, train=train)
        hw = (w.shape[-3], w.shape[-2])
        ppm = [w]
        for i, sc in enumerate(self.pool_scales):
            ppm.append(resize_bilinear(adaptive_avg_pool(w, sc), hw,
                                       align_corners=self.align_corners))
        w = ConvModule(self.psp_out_channels, 3, padding=1,
                       name="psp_bottleneck")(
            jnp.concatenate(ppm, axis=-1), train=train)
        sub4 = ConvModule(self.out_channels[2], 1,
                          name="sub4_proj")(w, train=train)
        return sub1, sub2, sub4


# ---------------------------------------------------------------------------
# Twins (PCPVT / SVT)
# ---------------------------------------------------------------------------


class _SRAttention(nn.Module):
    """Spatially-reduced (global sub-sampled) attention — twins.py GSA."""
    dim: int
    num_heads: int
    sr_ratio: int = 1

    @nn.compact
    def __call__(self, x, hw):
        b, n, c = x.shape
        h, w = hw
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, name="q")(x)
        kv_in = x
        if self.sr_ratio > 1:
            g = x.reshape(b, h, w, c)
            g = nn.Conv(self.dim, (self.sr_ratio,) * 2,
                        strides=(self.sr_ratio,) * 2, name="sr")(g)
            kv_in = nn.LayerNorm(name="sr_norm")(
                g.reshape(b, -1, self.dim))
        kv = nn.Dense(self.dim * 2, name="kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            return t.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        attn = nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", heads(q), heads(k))
                          / np.sqrt(hd), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class _LocalAttention(nn.Module):
    """Locally-grouped self-attention — twins.py LSA (SVT only)."""
    dim: int
    num_heads: int
    window: int = 7

    @nn.compact
    def __call__(self, x, hw):
        b, n, c = x.shape
        h, w = hw
        ws = min(self.window, h, w)
        ph, pw = (-h) % ws, (-w) % ws
        g = x.reshape(b, h, w, c)
        g = jnp.pad(g, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hh, ww = h + ph, w + pw
        g = g.reshape(b, hh // ws, ws, ww // ws, ws, c)
        g = g.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        qkv = nn.Dense(self.dim * 3, name="qkv")(g)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.dim // self.num_heads
        bb = g.shape[0]

        def heads(t):
            return t.reshape(bb, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        attn = nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", heads(q), heads(k))
                          / np.sqrt(hd), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(bb, ws * ws, self.dim)
        out = nn.Dense(self.dim, name="proj")(out)
        out = out.reshape(b, hh // ws, ww // ws, ws, ws, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, c)
        return out[:, :h, :w].reshape(b, n, c)


class _TwinsBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1
    local_window: int = 0  # >0 -> LSA block (SVT)
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, hw):
        y = nn.LayerNorm(name="norm1")(x)
        if self.local_window > 0:
            y = _LocalAttention(self.dim, self.num_heads, self.local_window,
                                name="attn")(y, hw)
        else:
            y = _SRAttention(self.dim, self.num_heads, self.sr_ratio,
                             name="attn")(y, hw)
        x = x + y
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, name="fc1")(y)
        y = nn.Dense(self.dim, name="fc2")(nn.gelu(y))
        return x + y


@BACKBONES.register()
class PCPVT(nn.Module):
    """Twins-PCPVT (twins.py): pyramid transformer with conditional position
    encoding (depthwise-conv PEG after the first block of each stage)."""
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    depths: Sequence[int] = (3, 4, 6, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    windows: Sequence[int] = (0, 0, 0, 0)  # >0 on odd blocks -> SVT
    out_indices: Sequence[int] = (0, 1, 2, 3)
    in_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for s, dim in enumerate(self.embed_dims):
            patch = 4 if s == 0 else 2
            x = nn.Conv(dim, (patch, patch), strides=(patch, patch),
                        name=f"patch_embed{s}")(x)
            b, h, w, _ = x.shape
            t = nn.LayerNorm(name=f"embed_norm{s}")(
                x.reshape(b, h * w, dim))
            for j in range(self.depths[s]):
                win = self.windows[s] if j % 2 == 0 else 0
                t = _TwinsBlock(dim, self.num_heads[s], self.sr_ratios[s],
                                local_window=win,
                                mlp_ratio=self.mlp_ratios[s],
                                name=f"block{s}_{j}")(t, (h, w))
                if j == 0:  # PEG: depthwise conv position encoding
                    g = t.reshape(b, h, w, dim)
                    g = g + nn.Conv(dim, (3, 3), padding=((1, 1), (1, 1)),
                                    feature_group_count=dim,
                                    name=f"peg{s}")(g)
                    t = g.reshape(b, h * w, dim)
            x = nn.LayerNorm(name=f"out_norm{s}")(t).reshape(b, h, w, dim)
            if s in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register()
class SVT(PCPVT):
    """Twins-SVT (twins.py): PCPVT with locally-grouped attention on even
    blocks (window 7) alternating with global sub-sampled attention."""
    embed_dims: Sequence[int] = (64, 128, 256, 512)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    depths: Sequence[int] = (2, 2, 10, 4)
    windows: Sequence[int] = (7, 7, 7, 7)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)


# ---------------------------------------------------------------------------
# BEiT / MAE
# ---------------------------------------------------------------------------


class _BEiTBlock(nn.Module):
    dim: int
    num_heads: int
    grid: int  # relative-position grid side (img_size // patch_size)

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hd = self.dim // self.num_heads
        g = self.grid
        # learned relative position bias over the patch grid
        table = self.param("rel_pos_bias",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * g - 1) ** 2, self.num_heads))
        coords = np.stack(np.meshgrid(np.arange(g), np.arange(g),
                                      indexing="ij")).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :] + g - 1
        idx = jnp.asarray(rel[0] * (2 * g - 1) + rel[1])
        bias = table[idx.reshape(-1)].reshape(
            g * g, g * g, self.num_heads).transpose(2, 0, 1)

        y = nn.LayerNorm(name="norm1")(x)
        qkv = nn.Dense(self.dim * 3, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", heads(q), heads(k)) / np.sqrt(hd)
        if n == g * g:
            attn = attn + bias[None]
        out = jnp.einsum("bhnm,bhmd->bhnd", nn.softmax(attn, axis=-1),
                         heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        out = nn.Dense(self.dim, name="proj")(out)
        gamma1 = self.param("gamma1",
                            nn.initializers.constant(0.1), (self.dim,))
        x = x + gamma1 * out
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim * 4, name="fc1")(y)
        y = nn.Dense(self.dim, name="fc2")(nn.gelu(y))
        gamma2 = self.param("gamma2",
                            nn.initializers.constant(0.1), (self.dim,))
        return x + gamma2 * y


@BACKBONES.register()
class BEiT(nn.Module):
    """BEiT backbone (beit.py): ViT with per-block relative position bias
    and LayerScale; multi-level taps rescaled into a pyramid."""
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    out_indices: Sequence[int] = (3, 5, 7, 11)
    in_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                    name="patch_embed")(x)
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        outs = []
        for i in range(self.depth):
            t = _BEiTBlock(self.embed_dim, self.num_heads, grid=h,
                           name=f"block{i}")(t)
            if i in self.out_indices:
                outs.append(t.reshape(b, h, w, c))
        # rescale taps to a 4x..1/2x pyramid like the reference's FPN adapter
        scales = (4.0, 2.0, 1.0, 0.5)
        pyramid = []
        for i, (f, s) in enumerate(zip(outs, scales[:len(outs)])):
            pyramid.append(resize_bilinear(
                f, (max(int(h * s), 1), max(int(w * s), 1))))
        return tuple(pyramid)


@BACKBONES.register()
class MAE(nn.Module):
    """MAE fine-tune backbone (mae.py): plain ViT encoder (no mask tokens at
    fine-tune time), multi-level taps in a pyramid."""
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    out_indices: Sequence[int] = (3, 5, 7, 11)
    in_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .vit import ViTBlock
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                    name="patch_embed")(x)
        b, h, w, c = x.shape
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, h * w, c)) if h * w > 0 else None
        t = x.reshape(b, h * w, c) + pos
        outs = []
        for i in range(self.depth):
            t = ViTBlock(self.embed_dim, self.num_heads, name=f"block{i}")(t)
            if i in self.out_indices:
                outs.append(nn.LayerNorm(name=f"tap_norm{i}")(t)
                            .reshape(b, h, w, c))
        scales = (4.0, 2.0, 1.0, 0.5)
        return tuple(resize_bilinear(
            f, (max(int(h * s), 1), max(int(w * s), 1)))
            for f, s in zip(outs, scales[:len(outs)]))
