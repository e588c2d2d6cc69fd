"""Mix Vision Transformer (SegFormer backbone; reference mmseg backbones/mit.py).

Hierarchical transformer with overlapping patch embeddings, spatial-reduction
attention and Mix-FFN (depthwise conv in the MLP).  Attention runs as plain
XLA dot-products — at segmentation resolutions the sequence lengths are
modest and XLA's fused attention is MXU-bound already.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..registry import BACKBONES
from .layers import Conv2d


class EfficientAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1

    @nn.compact
    def __call__(self, x, h: int, w: int):
        b, n, c = x.shape
        q = nn.Dense(self.dim, name="q")(x)
        if self.sr_ratio > 1:
            xr = x.reshape(b, h, w, c)
            xr = Conv2d(self.dim, self.sr_ratio, stride=self.sr_ratio,
                        name="sr")(xr)
            xr = xr.reshape(b, -1, c)
            xr = nn.LayerNorm(name="sr_norm")(xr)
        else:
            xr = x
        kv = nn.Dense(self.dim * 2, name="kv")(xr)
        k, v = jnp.split(kv, 2, axis=-1)
        hd = self.dim // self.num_heads

        def heads(t):
            return t.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) / jnp.sqrt(hd)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class MixFFN(nn.Module):
    dim: int
    ratio: int = 4

    @nn.compact
    def __call__(self, x, h: int, w: int):
        b, n, c = x.shape
        hidden = self.dim * self.ratio
        x = nn.Dense(hidden, name="fc1")(x)
        xr = x.reshape(b, h, w, hidden)
        xr = nn.Conv(hidden, (3, 3), padding="SAME",
                     feature_group_count=hidden, name="dwconv")(xr)
        x = nn.gelu(xr.reshape(b, n, hidden))
        return nn.Dense(self.dim, name="fc2")(x)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, h: int, w: int):
        x = x + EfficientAttention(self.dim, self.num_heads, self.sr_ratio,
                                   name="attn")(
            nn.LayerNorm(name="norm1")(x), h, w)
        x = x + MixFFN(self.dim, self.mlp_ratio, name="ffn")(
            nn.LayerNorm(name="norm2")(x), h, w)
        return x


@BACKBONES.register()
class MixVisionTransformer(nn.Module):
    embed_dims: Sequence[int] = (32, 64, 160, 256)   # mit-b0
    num_layers: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    patch_sizes: Sequence[int] = (7, 3, 3, 3)
    patch_strides: Sequence[int] = (4, 2, 2, 2)
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i in range(len(self.embed_dims)):
            pad = self.patch_sizes[i] // 2
            x = Conv2d(self.embed_dims[i], self.patch_sizes[i],
                       stride=self.patch_strides[i], padding=pad,
                       name=f"patch_embed{i + 1}")(x)
            b, h, w, c = x.shape
            t = x.reshape(b, h * w, c)
            t = nn.LayerNorm(name=f"embed_norm{i + 1}")(t)
            for j in range(self.num_layers[i]):
                t = MiTBlock(self.embed_dims[i], self.num_heads[i],
                             self.sr_ratios[i],
                             name=f"stage{i + 1}_block{j}")(t, h, w)
            t = nn.LayerNorm(name=f"out_norm{i + 1}")(t)
            x = t.reshape(b, h, w, c)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


# SegFormer size aliases
@BACKBONES.register(name="MITB0")
class MITB0(MixVisionTransformer):
    pass


@BACKBONES.register(name="MITB2")
class MITB2(MixVisionTransformer):
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_layers: Sequence[int] = (3, 4, 6, 3)
