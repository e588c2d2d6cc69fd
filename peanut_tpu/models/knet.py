"""K-Net segmentor head (zoo; reference knet_head.py).

Structural re-implementation of KNet's iterative kernel-update decoding:
a kernel-generate head produces initial per-class kernels + masks, then
``num_stages`` KernelUpdateHeads refine (kernels, masks) pairs — each stage
gathers mask-weighted group features, gates them into the kernels
(KernelUpdator), runs kernel self-attention + FFN, and re-predicts masks.
All stages are dense einsums over (B, K, C) — MXU-friendly, no dynamic
shapes.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..registry import HEADS
from .layers import ConvModule
from .heads import DecodeHeadMixin


class KernelUpdator(nn.Module):
    """Adaptive kernel update (knet_head.py KernelUpdator): gated fusion of
    the group feature into the kernel feature."""
    channels: int = 256

    @nn.compact
    def __call__(self, update_feature, input_feature):
        """update_feature: (B,K,C) group features; input_feature: (B,K,C)
        kernels.  Returns fused (B,K,C)."""
        c = self.channels
        param = nn.Dense(2 * c, name="dynamic_layer")(update_feature)
        param_in, param_out = jnp.split(param, 2, axis=-1)
        input_feats = nn.Dense(2 * c, name="input_layer")(input_feature)
        input_in, input_out = jnp.split(input_feats, 2, axis=-1)

        gate_feats = input_in * param_in
        input_gate = nn.sigmoid(nn.LayerNorm(name="input_gate_norm")(
            nn.Dense(c, name="input_gate")(gate_feats)))
        update_gate = nn.sigmoid(nn.LayerNorm(name="update_gate_norm")(
            nn.Dense(c, name="update_gate")(gate_feats)))

        param_out = nn.LayerNorm(name="param_norm")(param_out)
        input_out = nn.LayerNorm(name="input_norm")(input_out)
        features = update_gate * param_out + input_gate * input_out
        features = nn.Dense(c, name="fc_layer")(features)
        features = nn.LayerNorm(name="fc_norm")(features)
        return nn.relu(features)


class KernelUpdateHead(nn.Module):
    """One refinement stage (knet_head.py KernelUpdateHead)."""
    num_classes: int = 19
    channels: int = 256
    num_heads: int = 8
    feedforward_channels: int = 1024
    mask_thr: float = 0.5

    @nn.compact
    def __call__(self, feats, kernels, masks):
        """feats (B,H,W,C), kernels (B,K,C), masks (B,H,W,K) logits."""
        b, h, w, c = feats.shape
        k = kernels.shape[1]
        # group features: hard-mask-weighted average of pixels per kernel
        soft = nn.sigmoid(masks)
        hard = (soft > self.mask_thr).astype(feats.dtype)
        denom = jnp.maximum(hard.sum(axis=(1, 2)), 1.0)       # (B,K)
        group = jnp.einsum("bhwk,bhwc->bkc", hard, feats) / denom[..., None]

        kernels = KernelUpdator(self.channels,
                                name="kernel_update_conv")(group, kernels)
        # kernel interaction: MHSA over the K kernels + FFN
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, name="attention")(kernels, kernels)
        kernels = nn.LayerNorm(name="attention_norm")(kernels + y)
        y = nn.Dense(self.feedforward_channels, name="ffn_fc1")(kernels)
        y = nn.Dense(self.channels, name="ffn_fc2")(nn.gelu(y))
        kernels = nn.LayerNorm(name="ffn_norm")(kernels + y)
        # mask branch -> new mask logits
        mask_feat = nn.relu(nn.LayerNorm(name="mask_fc_norm")(
            nn.Dense(self.channels, name="mask_fc")(kernels)))
        new_masks = jnp.einsum("bkc,bhwc->bhwk", mask_feat, feats)
        new_masks = new_masks / np.sqrt(c)
        return kernels, new_masks


@HEADS.register()
class IterativeDecodeHead(nn.Module, DecodeHeadMixin):
    """KNet head (knet_head.py IterativeDecodeHead): kernel-generate head +
    ``num_stages`` kernel-update stages; returns final mask logits."""
    in_channels: int = 2048
    channels: int = 256
    num_classes: int = 19
    num_stages: int = 3
    num_heads: int = 8
    feedforward_channels: int = 1024
    dropout_ratio: float = 0.1
    in_index: int = 3
    align_corners: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs[self.in_index]
        feats = ConvModule(self.channels, 3, padding=1,
                           name="generate_conv")(x, train=train)
        b = feats.shape[0]
        # initial masks from a conv classifier; its class filters seed the
        # kernels (knet_head.py: conv_seg weights broadcast per-sample)
        masks = self.cls_seg(feats, train)
        seed = self.param("kernel_seed",
                          nn.initializers.truncated_normal(0.02),
                          (self.num_classes, self.channels))
        kernels = jnp.broadcast_to(seed, (b,) + seed.shape)
        for i in range(self.num_stages):
            kernels, masks = KernelUpdateHead(
                num_classes=self.num_classes, channels=self.channels,
                num_heads=self.num_heads,
                feedforward_channels=self.feedforward_channels,
                name=f"kernel_update_head{i}")(feats, kernels, masks)
        return masks
