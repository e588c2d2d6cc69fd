"""ViT and Swin transformer backbones (zoo; reference mmseg vit.py/swin.py).

ViT: plain patch transformer with optional multi-level feature taps (SETR
-style); Swin: hierarchical windowed attention with shifted windows and
patch merging.  Window attention runs as reshaped dense attention — window
sizes are small, XLA keeps it on the MXU.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..registry import BACKBONES
from .layers import Conv2d
from .ops import resize_bilinear


class MLP(nn.Module):
    dim: int
    ratio: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * self.ratio, name="fc1")(x)
        # exact erf GELU (torch nn.GELU default; flax defaults to tanh)
        return nn.Dense(self.dim, name="fc2")(nn.gelu(h, approximate=False))


def _rel_pos_index(w: int) -> np.ndarray:
    """Swin relative-position index, identical to the torch buffer layout:
    pair (i, j) of window tokens -> row of the ((2w-1)^2, heads) table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel = rel + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


class Attention(nn.Module):
    dim: int
    num_heads: int
    # > 0: windowed attention with a learned relative-position bias table
    # (Swin WindowMSA; reference prediction/mmseg/models/backbones/swin.py)
    window_size: int = 0

    @nn.compact
    def __call__(self, x, bias=None):
        b, n, c = x.shape
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.dim // self.num_heads

        def heads(t):
            return t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", heads(q), heads(k)) / np.sqrt(hd)
        if self.window_size:
            w = self.window_size
            table = self.param("rel_pos_bias_table",
                               nn.initializers.normal(0.02),
                               ((2 * w - 1) ** 2, self.num_heads))
            idx = _rel_pos_index(w)
            rel = table[idx.reshape(-1)].reshape(w * w, w * w,
                                                 self.num_heads)
            attn = attn + jnp.transpose(rel, (2, 0, 1))[None]
        if bias is not None:
            if bias.ndim == 4 and bias.shape[0] != b:
                # per-window shift mask (nW, 1, n, n): broadcast over the
                # image batch folded into axis 0 (b = batch * nW)
                nw = bias.shape[0]
                attn = (attn.reshape((b // nw, nw) + attn.shape[1:])
                        + bias[None]).reshape(attn.shape)
            else:
                attn = attn + bias
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        x = x + Attention(self.dim, self.num_heads, name="attn")(
            nn.LayerNorm(name="norm1")(x))
        x = x + MLP(self.dim, name="mlp")(nn.LayerNorm(name="norm2")(x))
        return x


@BACKBONES.register()
class VisionTransformer(nn.Module):
    """ViT backbone with SETR-style multi-level taps, upsampled to /4..,/32
    pyramid shapes so standard heads can consume them."""
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    out_indices: Sequence[int] = (2, 5, 8, 11)
    with_pos_embed: bool = True
    img_size: int = 224  # positional grid base; interpolated to input

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        x = Conv2d(self.embed_dim, self.patch_size, stride=self.patch_size,
                   name="patch_embed")(x)
        gh, gw = x.shape[1], x.shape[2]
        t = x.reshape(b, gh * gw, self.embed_dim)
        if self.with_pos_embed:
            base = self.img_size // self.patch_size
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (1, base, base, self.embed_dim))
            pos = resize_bilinear(pos, (gh, gw), align_corners=False)
            t = t + pos.reshape(1, gh * gw, self.embed_dim)
        outs = []
        for i in range(self.depth):
            t = ViTBlock(self.embed_dim, self.num_heads,
                         name=f"block{i}")(t)
            if i in self.out_indices:
                outs.append(t.reshape(b, gh, gw, self.embed_dim))
        # reshape taps into a /4,/8,/16,/32-style pyramid for generic heads
        scales = [4, 2, 1, 0.5][:len(outs)]
        pyramid = []
        for o, s in zip(outs, scales):
            hw = (int(gh * s), int(gw * s))
            pyramid.append(resize_bilinear(o, hw, align_corners=False))
        return tuple(pyramid)


def _window_partition(x, ws: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(wins, ws: int, b: int, h: int, w: int):
    c = wins.shape[-1]
    x = wins.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


@functools.lru_cache(maxsize=64)
def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Shifted-window attention mask (nW, n, n): 0 within a contiguous
    region, -100 across the wrap-around seams introduced by the roll
    (Swin ShiftWindowMSA semantics)."""
    img = np.zeros((1, hp, wp, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, vs] = cnt
            cnt += 1
    win = np.asarray(
        img.reshape(1, hp // ws, ws, wp // ws, ws, 1)
        .transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws))
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int = 7
    shift: int = 0

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = self.window
        pad_h = (-h) % ws
        pad_w = (-w) % ws
        shortcut = x
        y = nn.LayerNorm(name="norm1")(x)
        y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = y.shape[1], y.shape[2]
        mask = None
        if self.shift:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(
                _shift_attn_mask(hp, wp, ws, self.shift))[:, None]
        wins = _window_partition(y, ws)
        wins = Attention(self.dim, self.num_heads, window_size=ws,
                         name="attn")(wins, mask)
        y = _window_reverse(wins, ws, b, hp, wp)
        if self.shift:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        y = y[:, :h, :w]
        x = shortcut + y
        x = x + MLP(self.dim, name="mlp")(nn.LayerNorm(name="norm2")(x))
        return x


@BACKBONES.register()
class SwinTransformer(nn.Module):
    """Swin-T-shaped hierarchical backbone (shifted-window attention)."""
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    patch_size: int = 4
    patch_norm: bool = True   # official/mmseg Swin: LN after patch embed

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.embed_dim, self.patch_size, stride=self.patch_size,
                   name="patch_embed")(x)
        if self.patch_norm:
            x = nn.LayerNorm(name="patch_norm_ln")(x)
        outs = []
        dim = self.embed_dim
        for s, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for i in range(depth):
                shift = 0 if i % 2 == 0 else self.window // 2
                x = SwinBlock(dim, heads, self.window, shift,
                              name=f"stage{s}_block{i}")(x)
            outs.append(nn.LayerNorm(name=f"out_norm{s}")(x))
            if s < len(self.depths) - 1:
                # patch merging: 2x2 concat + linear
                b, h, w, c = x.shape
                ph, pw2 = (-h) % 2, (-w) % 2
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw2), (0, 0)))
                x = jnp.concatenate(
                    [x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                     x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
                dim *= 2
                x = nn.Dense(dim, name=f"merge{s}")(
                    nn.LayerNorm(name=f"merge_norm{s}")(x))
        return tuple(outs)
