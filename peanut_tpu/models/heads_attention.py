"""Attention-based decode heads (zoo; reference da_head.py, nl_head.py,
gc_head.py, ann_head.py patterns).

The reference's CrissCross/PSA variants wrap mmcv CUDA kernels; the heads
here use the pure dense-attention formulations that XLA maps onto the MXU —
at d8 segmentation resolutions the token counts are small.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import HEADS
from .layers import ConvModule, Conv2d
from .heads import DecodeHeadMixin


class PAM(nn.Module):
    """Position attention module (DANet)."""
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inter = max(self.channels // 8, 1)
        q = Conv2d(inter, 1, name="query")(x).reshape(b, h * w, inter)
        k = Conv2d(inter, 1, name="key")(x).reshape(b, h * w, inter)
        v = Conv2d(c, 1, name="value")(x).reshape(b, h * w, c)
        attn = nn.softmax(jnp.einsum("bnc,bmc->bnm", q, k), axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", attn, v).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return x + gamma * out


class CAM(nn.Module):
    """Channel attention module (DANet)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c)
        energy = jnp.einsum("bnc,bnd->bcd", flat, flat)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = nn.softmax(energy, axis=-1)
        out = jnp.einsum("bcd,bnd->bnc", attn, flat).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return x + gamma * out


@HEADS.register()
class DAHead(nn.Module, DecodeHeadMixin):
    """Dual attention head (da_head.py)."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    dropout_ratio: float = 0.1
    in_index: int = 3
    align_corners: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs[self.in_index]
        pam = ConvModule(self.channels, 3, padding=1, name="pam_in")(
            x, train=train)
        pam = PAM(self.channels, name="pam")(pam)
        pam = ConvModule(self.channels, 3, padding=1, name="pam_out")(
            pam, train=train)
        cam = ConvModule(self.channels, 3, padding=1, name="cam_in")(
            x, train=train)
        cam = CAM(name="cam")(cam)
        cam = ConvModule(self.channels, 3, padding=1, name="cam_out")(
            cam, train=train)
        return self.cls_seg(pam + cam, train)


@HEADS.register()
class NLHead(nn.Module, DecodeHeadMixin):
    """Non-local head (nl_head.py): FCN conv + embedded-gaussian NL block."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    dropout_ratio: float = 0.1
    in_index: int = 3
    align_corners: bool = False
    reduction: int = 2

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs[self.in_index]
        feats = ConvModule(self.channels, 3, padding=1, name="conv0")(
            x, train=train)
        b, h, w, c = feats.shape
        inter = max(c // self.reduction, 1)
        theta = Conv2d(inter, 1, name="theta")(feats).reshape(b, h * w, inter)
        phi = Conv2d(inter, 1, name="phi")(feats).reshape(b, h * w, inter)
        g = Conv2d(inter, 1, name="g")(feats).reshape(b, h * w, inter)
        attn = nn.softmax(jnp.einsum("bnc,bmc->bnm", theta, phi), axis=-1)
        y = jnp.einsum("bnm,bmc->bnc", attn, g).reshape(b, h, w, inter)
        y = Conv2d(c, 1, name="out_proj")(y)
        feats = feats + y
        feats = ConvModule(self.channels, 3, padding=1, name="conv1")(
            feats, train=train)
        return self.cls_seg(feats, train)


@HEADS.register()
class GCHead(nn.Module, DecodeHeadMixin):
    """Global context head (gc_head.py): FCN conv + GC block."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    dropout_ratio: float = 0.1
    in_index: int = 3
    align_corners: bool = False
    ratio: float = 0.25

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs[self.in_index]
        feats = ConvModule(self.channels, 3, padding=1, name="conv0")(
            x, train=train)
        b, h, w, c = feats.shape
        # context modelling: softmax spatial pool
        mask = Conv2d(1, 1, name="mask")(feats).reshape(b, h * w, 1)
        mask = nn.softmax(mask, axis=1)
        context = jnp.einsum("bnk,bnc->bc", mask, feats.reshape(b, h * w, c))
        # channel transform (bottleneck MLP with LayerNorm, GCNet style)
        hidden = max(int(c * self.ratio), 1)
        t = nn.Dense(hidden, name="down")(context)
        t = nn.LayerNorm(name="ln")(t)
        t = nn.relu(t)
        t = nn.Dense(c, name="up")(t)
        feats = feats + t[:, None, None, :]
        feats = ConvModule(self.channels, 3, padding=1, name="conv1")(
            feats, train=train)
        return self.cls_seg(feats, train)
