"""Zoo necks (flax.linen, NHWC) — structural parity with the reference's
mmseg/models/necks/: mla_neck.py, multilevel_neck.py, jpu.py, ic_neck.py,
featurepyramid.py.  (The detectron2-parity FPN used by Mask R-CNN lives in
fpn.py; the mmseg-style FPN neck here feeds FPNHead.)"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..registry import NECKS
from .layers import ConvModule, Conv2d
from .ops import resize_bilinear


@NECKS.register()
class MLANeck(nn.Module):
    """Multi-Level feature Aggregation for SETR-MLA (mla_neck.py):
    LayerNorm each ViT tap, top-down cumulative 1x1+3x3 conv streams."""
    in_channels: Sequence[int] = (1024, 1024, 1024, 1024)
    out_channels: int = 256

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        feats = [nn.LayerNorm(name=f"norm{i}")(x)
                 for i, x in enumerate(inputs)]
        # cumulative aggregation: coarse stream feeds into finer ones
        mids = [ConvModule(self.out_channels, 1, name=f"mla_p{i}_1x1")(
            f, train=train) for i, f in enumerate(feats)]
        for i in range(len(mids) - 2, -1, -1):
            mids[i] = mids[i] + mids[i + 1]
        outs = [ConvModule(self.out_channels, 3, padding=1,
                           name=f"mla_p{i}_3x3")(m, train=train)
                for i, m in enumerate(mids)]
        return tuple(outs)


@NECKS.register()
class MultiLevelNeck(nn.Module):
    """Rescale a single-resolution backbone (ViT) into a pyramid
    (multilevel_neck.py): 1x1 proj, resize by scales, 3x3 conv."""
    in_channels: Sequence[int] = (1024, 1024, 1024, 1024)
    out_channels: int = 256
    scales: Sequence[float] = (0.5, 1, 2, 4)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        if len(inputs) == 1:
            inputs = [inputs[0]] * len(self.scales)
        projected = [Conv2d(self.out_channels, 1, name=f"lateral{i}")(x)
                     for i, x in enumerate(inputs)]
        outs = []
        for i, (x, s) in enumerate(zip(projected, self.scales)):
            h = max(int(round(x.shape[-3] * s)), 1)
            w = max(int(round(x.shape[-2] * s)), 1)
            y = resize_bilinear(x, (h, w))
            outs.append(Conv2d(self.out_channels, 3, padding=1,
                               name=f"conv{i}")(y))
        return tuple(outs)


@NECKS.register()
class JPU(nn.Module):
    """Joint Pyramid Upsampling (jpu.py): upsample the top 3 levels to the
    finest of them, concat, parallel dilated separable convs."""
    in_channels: Sequence[int] = (512, 1024, 2048)
    mid_channels: int = 512
    dilations: Sequence[int] = (1, 2, 4, 8)
    start_level: int = 0
    align_corners: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        feats = list(inputs[self.start_level:])
        convs = [ConvModule(self.mid_channels, 3, padding=1,
                            name=f"conv{i}")(f, train=train)
                 for i, f in enumerate(feats)]
        hw = (convs[0].shape[-3], convs[0].shape[-2])
        up = [resize_bilinear(c, hw, align_corners=self.align_corners)
              for c in convs]
        cat = jnp.concatenate(up, axis=-1)
        outs = []
        for i, d in enumerate(self.dilations):
            c = cat.shape[-1]
            y = nn.Conv(c, (3, 3), padding=((d, d), (d, d)),
                        kernel_dilation=(d, d), feature_group_count=c,
                        use_bias=False, name=f"dil{i}_dw")(cat)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"dil{i}_bn")(y)
            y = nn.relu(y)
            outs.append(ConvModule(self.mid_channels, 1,
                                   name=f"dil{i}_pw")(y, train=train))
        fused = jnp.concatenate(outs, axis=-1)
        # JPU replaces the last backbone level with the fused feature
        return tuple(list(inputs[:self.start_level + 1])
                     + feats[1:-1] + [fused])


class _CascadeFeatureFusion(nn.Module):
    """CFF unit of ICNet (ic_neck.py): dilated-conv low branch upsampled and
    summed with a projected high-res branch."""
    out_channels: int
    align_corners: bool = False

    @nn.compact
    def __call__(self, low, high, train: bool = False):
        hw = (high.shape[-3], high.shape[-2])
        low = resize_bilinear(low, hw, align_corners=self.align_corners)
        low = ConvModule(self.out_channels, 3, padding=2, dilation=2,
                         with_act=False, name="conv_low")(low, train=train)
        high = ConvModule(self.out_channels, 1, with_act=False,
                          name="conv_high")(high, train=train)
        return nn.relu(low + high)


@NECKS.register()
class ICNeck(nn.Module):
    """ICNet fusion neck (ic_neck.py): two cascade feature fusions over the
    (sub4, sub2, sub1) branch outputs; returns all fusion stages."""
    in_channels: Sequence[int] = (64, 256, 256)
    out_channels: int = 128
    align_corners: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        sub1, sub2, sub4 = inputs[-3], inputs[-2], inputs[-1]
        cff42 = _CascadeFeatureFusion(self.out_channels, self.align_corners,
                                      name="cff42")(sub4, sub2, train=train)
        cff21 = _CascadeFeatureFusion(self.out_channels, self.align_corners,
                                      name="cff21")(cff42, sub1, train=train)
        return (cff42, cff21,
                resize_bilinear(cff21, (cff21.shape[-3] * 2,
                                        cff21.shape[-2] * 2),
                                align_corners=self.align_corners))


@NECKS.register()
class Feature2Pyramid(nn.Module):
    """Rescale equal-resolution transformer taps into a stride pyramid
    (featurepyramid.py): per-level resize + conv (deconvolution analog)."""
    embed_dim: int = 768
    rescales: Sequence[float] = (4, 2, 1, 0.5)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        outs = []
        for i, (x, s) in enumerate(zip(inputs, self.rescales)):
            h = max(int(round(x.shape[-3] * s)), 1)
            w = max(int(round(x.shape[-2] * s)), 1)
            y = resize_bilinear(x, (h, w))
            if s != 1:
                y = ConvModule(x.shape[-1], 3, padding=1,
                               name=f"rescale{i}")(y, train=train)
            outs.append(y)
        return tuple(outs)
