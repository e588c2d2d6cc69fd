"""Pretrained-weight converters for the backbone zoo.

TPU twins of the reference's model converters
(/root/reference/prediction/tools/model_converters/: vit2mmseg, mit2mmseg,
swin2mmseg, vitjax2mmseg, ...): official/timm torch checkpoints (and the
augreg JAX ViT npz format) convert into this framework's flax trees.

Unlike the PEANUT-critical importers (core/checkpoint.py, models/d2_import
.py) these are permissive: they return ``(variables, leftovers)`` where
``leftovers`` lists source keys with no destination (e.g. a checkpoint's
optimizer or EMA side-car entries) — callers decide whether leftovers are
acceptable.  The Swin converter consumes every model key, including the
relative-position bias tables (round-3).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

_CONV_T = (2, 3, 1, 0)  # torch OIHW -> flax HWIO


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _dense(params, sd, tkey, fpath, handled):
    _set(params, fpath + ("kernel",), sd[f"{tkey}.weight"].T)
    handled.add(f"{tkey}.weight")
    if f"{tkey}.bias" in sd:
        _set(params, fpath + ("bias",), sd[f"{tkey}.bias"])
        handled.add(f"{tkey}.bias")


def _ln(params, sd, tkey, fpath, handled):
    _set(params, fpath + ("scale",), sd[f"{tkey}.weight"])
    _set(params, fpath + ("bias",), sd[f"{tkey}.bias"])
    handled.update({f"{tkey}.weight", f"{tkey}.bias"})


def _conv(params, sd, tkey, fpath, handled, bias=True):
    _set(params, fpath + ("conv", "kernel"),
         sd[f"{tkey}.weight"].transpose(_CONV_T))
    handled.add(f"{tkey}.weight")
    if bias and f"{tkey}.bias" in sd:
        _set(params, fpath + ("conv", "bias"), sd[f"{tkey}.bias"])
        handled.add(f"{tkey}.bias")


def convert_timm_vit(sd: Dict[str, np.ndarray]
                     ) -> Tuple[Dict[str, Any], List[str]]:
    """timm/DeiT ViT state dict -> VisionTransformer (models/vit.py).

    cls_token is dropped (this backbone is purely spatial, SETR-style);
    pos_embed drops the class token and reshapes to the (1, g, g, D) grid.
    """
    params: Dict[str, Any] = {}
    handled = set()

    _conv(params, sd, "patch_embed.proj", ("patch_embed",), handled)
    if "pos_embed" in sd:
        pe = sd["pos_embed"]
        n = pe.shape[1]
        g = int(np.sqrt(n - 1))
        if g * g == n - 1:
            pe = pe[:, 1:]
        else:
            g = int(np.sqrt(n))
        _set(params, ("pos_embed",),
             pe.reshape(1, g, g, pe.shape[-1]))
        handled.add("pos_embed")

    blk = re.compile(r"blocks\.(\d+)\.")
    n_blocks = 1 + max((int(m.group(1)) for k in sd
                        if (m := blk.match(k))), default=-1)
    for i in range(n_blocks):
        t = f"blocks.{i}"
        f = (f"block{i}",)
        _ln(params, sd, f"{t}.norm1", f + ("norm1",), handled)
        _ln(params, sd, f"{t}.norm2", f + ("norm2",), handled)
        _dense(params, sd, f"{t}.attn.qkv", f + ("attn", "qkv"), handled)
        _dense(params, sd, f"{t}.attn.proj", f + ("attn", "proj"), handled)
        _dense(params, sd, f"{t}.mlp.fc1", f + ("mlp", "fc1"), handled)
        _dense(params, sd, f"{t}.mlp.fc2", f + ("mlp", "fc2"), handled)

    leftovers = [k for k in sd if k not in handled]
    return {"params": params}, leftovers


def convert_augreg_vit(npz: Dict[str, np.ndarray]
                       ) -> Tuple[Dict[str, Any], List[str]]:
    """google-research augreg JAX ViT ``.npz`` -> VisionTransformer.

    The reference ships the inverse direction (vitjax2mmseg.py); being a
    JAX framework we consume the format natively.  Attention kernels are
    stored per-head (D, H, dh) and fold back to (D, 3D) with q,k,v order.
    """
    params: Dict[str, Any] = {}
    handled = set()
    d = npz["embedding/kernel"].shape[-1]

    _set(params, ("patch_embed", "conv", "kernel"), npz["embedding/kernel"])
    _set(params, ("patch_embed", "conv", "bias"), npz["embedding/bias"])
    handled.update({"embedding/kernel", "embedding/bias"})
    pe_key = "Transformer/posembed_input/pos_embedding"
    if pe_key in npz:
        pe = npz[pe_key]
        n = pe.shape[1]
        g = int(np.sqrt(n - 1))
        if g * g == n - 1:
            pe = pe[:, 1:]
        else:
            g = int(np.sqrt(n))
        _set(params, ("pos_embed",), pe.reshape(1, g, g, d))
        handled.add(pe_key)

    blk = re.compile(r"Transformer/encoderblock_(\d+)/")
    n_blocks = 1 + max((int(m.group(1)) for k in npz
                        if (m := blk.match(k))), default=-1)
    for i in range(n_blocks):
        t = f"Transformer/encoderblock_{i}"
        f = (f"block{i}",)
        att = f"{t}/MultiHeadDotProductAttention_1"
        qkv_k, qkv_b = [], []
        for name in ("query", "key", "value"):
            k = npz[f"{att}/{name}/kernel"]          # (D, H, dh)
            b = npz[f"{att}/{name}/bias"]            # (H, dh)
            qkv_k.append(k.reshape(d, -1))
            qkv_b.append(b.reshape(-1))
            handled.update({f"{att}/{name}/kernel", f"{att}/{name}/bias"})
        _set(params, f + ("attn", "qkv", "kernel"),
             np.concatenate(qkv_k, axis=1))
        _set(params, f + ("attn", "qkv", "bias"), np.concatenate(qkv_b))
        ok = npz[f"{att}/out/kernel"]                # (H, dh, D)
        _set(params, f + ("attn", "proj", "kernel"), ok.reshape(-1, d))
        _set(params, f + ("attn", "proj", "bias"), npz[f"{att}/out/bias"])
        handled.update({f"{att}/out/kernel", f"{att}/out/bias"})
        for ln_jax, ln_f in (("LayerNorm_0", "norm1"), ("LayerNorm_2",
                                                        "norm2")):
            _set(params, f + (ln_f, "scale"), npz[f"{t}/{ln_jax}/scale"])
            _set(params, f + (ln_f, "bias"), npz[f"{t}/{ln_jax}/bias"])
            handled.update({f"{t}/{ln_jax}/scale", f"{t}/{ln_jax}/bias"})
        mlp = f"{t}/MlpBlock_3"
        for j, fc in ((0, "fc1"), (1, "fc2")):
            _set(params, f + ("mlp", fc, "kernel"),
                 npz[f"{mlp}/Dense_{j}/kernel"])
            _set(params, f + ("mlp", fc, "bias"),
                 npz[f"{mlp}/Dense_{j}/bias"])
            handled.update({f"{mlp}/Dense_{j}/kernel",
                            f"{mlp}/Dense_{j}/bias"})

    leftovers = [k for k in npz if k not in handled]
    return {"params": params}, leftovers


def convert_official_mit(sd: Dict[str, np.ndarray]
                         ) -> Tuple[Dict[str, Any], List[str]]:
    """Official SegFormer (NVlabs) MiT state dict -> MixVisionTransformer
    (models/mit.py) — mit2mmseg.py twin."""
    params: Dict[str, Any] = {}
    handled = set()

    for i in range(1, 5):
        pe = f"patch_embed{i}"
        if f"{pe}.proj.weight" not in sd:
            continue
        _conv(params, sd, f"{pe}.proj", (f"patch_embed{i}",), handled)
        _ln(params, sd, f"{pe}.norm", (f"embed_norm{i}",), handled)
        if f"norm{i}.weight" in sd:                  # stage-end norm
            _ln(params, sd, f"norm{i}", (f"out_norm{i}",), handled)

        blk = re.compile(rf"block{i}\.(\d+)\.")
        n_blocks = 1 + max((int(m.group(1)) for k in sd
                            if (m := blk.match(k))), default=-1)
        for j in range(n_blocks):
            t = f"block{i}.{j}"
            f = (f"stage{i}_block{j}",)
            _ln(params, sd, f"{t}.norm1", f + ("norm1",), handled)
            _ln(params, sd, f"{t}.norm2", f + ("norm2",), handled)
            _dense(params, sd, f"{t}.attn.q", f + ("attn", "q"), handled)
            _dense(params, sd, f"{t}.attn.kv", f + ("attn", "kv"), handled)
            _dense(params, sd, f"{t}.attn.proj", f + ("attn", "proj"),
                   handled)
            if f"{t}.attn.sr.weight" in sd:
                _conv(params, sd, f"{t}.attn.sr", f + ("attn", "sr"),
                      handled)
                _ln(params, sd, f"{t}.attn.norm", f + ("attn", "sr_norm"),
                    handled)
            _dense(params, sd, f"{t}.mlp.fc1", f + ("ffn", "fc1"), handled)
            _dense(params, sd, f"{t}.mlp.fc2", f + ("ffn", "fc2"), handled)
            dw = f"{t}.mlp.dwconv.dwconv"
            if f"{dw}.weight" in sd:
                # bare nn.Conv (depthwise): kernel sits directly under the
                # module, torch (C,1,kh,kw) -> flax (kh,kw,1,C)
                _set(params, f + ("ffn", "dwconv", "kernel"),
                     sd[f"{dw}.weight"].transpose(_CONV_T))
                _set(params, f + ("ffn", "dwconv", "bias"),
                     sd[f"{dw}.bias"])
                handled.update({f"{dw}.weight", f"{dw}.bias"})

    leftovers = [k for k in sd if k not in handled
                 and not k.startswith("head")]
    return {"params": params}, leftovers


def convert_official_swin(sd: Dict[str, np.ndarray]
                          ) -> Tuple[Dict[str, Any], List[str]]:
    """Official Microsoft Swin state dict -> SwinTransformer
    (models/vit.py) — swin2mmseg.py twin.  Maps the relative-position
    bias tables and the post-patch-embed LayerNorm; the
    relative_position_index / attn_mask buffers are recomputed statically
    (models/vit.py _rel_pos_index / _shift_attn_mask) and marked handled."""
    params: Dict[str, Any] = {}
    handled = set()

    _conv(params, sd, "patch_embed.proj", ("patch_embed",), handled)
    if "patch_embed.norm.weight" in sd:
        _ln(params, sd, "patch_embed.norm", ("patch_norm_ln",), handled)

    lay = re.compile(r"layers\.(\d+)\.blocks\.(\d+)\.")
    stages = {}
    for k in sd:
        m = lay.match(k)
        if m:
            stages.setdefault(int(m.group(1)), set()).add(int(m.group(2)))
    for s, blocks in stages.items():
        for b in sorted(blocks):
            t = f"layers.{s}.blocks.{b}"
            f = (f"stage{s}_block{b}",)
            _ln(params, sd, f"{t}.norm1", f + ("norm1",), handled)
            _ln(params, sd, f"{t}.norm2", f + ("norm2",), handled)
            _dense(params, sd, f"{t}.attn.qkv", f + ("attn", "qkv"), handled)
            _dense(params, sd, f"{t}.attn.proj", f + ("attn", "proj"),
                   handled)
            tbl = f"{t}.attn.relative_position_bias_table"
            if tbl in sd:
                _set(params, f + ("attn", "rel_pos_bias_table"), sd[tbl])
                handled.add(tbl)
            # static in this implementation; nothing to load
            handled.add(f"{t}.attn.relative_position_index")
            handled.add(f"{t}.attn_mask")
            _dense(params, sd, f"{t}.mlp.fc1", f + ("mlp", "fc1"), handled)
            _dense(params, sd, f"{t}.mlp.fc2", f + ("mlp", "fc2"), handled)
        dt = f"layers.{s}.downsample"
        if f"{dt}.reduction.weight" in sd:
            _dense(params, sd, f"{dt}.reduction", (f"merge{s}",), handled)
            _ln(params, sd, f"{dt}.norm", (f"merge_norm{s}",), handled)

    # out_norms: official has a single final `norm`; mmseg adds per-stage
    # norms.  Map what exists.
    for s in range(4):
        if f"norm{s}.weight" in sd:
            _ln(params, sd, f"norm{s}", (f"out_norm{s}",), handled)

    leftovers = [k for k in sd if k not in handled
                 and not k.startswith("head")]
    return {"params": params}, leftovers


def convert_mmcls_convnext(sd: Dict[str, np.ndarray]
                           ) -> Tuple[Dict[str, Any], List[str]]:
    """mmcls ConvNeXt state dict (the reference configs' pretrained source,
    names ``backbone.downsample_layers.i.{0,1}``, ``backbone.stages.i.j.*``)
    -> models/convnext.py ConvNeXt.  Accepts keys with or without the
    ``backbone.`` prefix."""
    params: Dict[str, Any] = {}
    handled = set()
    sd = {k[len("backbone."):] if k.startswith("backbone.") else k: v
          for k, v in sd.items()}

    def ln(tkey, fpath):
        _set(params, fpath + ("scale",), sd[f"{tkey}.weight"])
        _set(params, fpath + ("bias",), sd[f"{tkey}.bias"])
        handled.update({f"{tkey}.weight", f"{tkey}.bias"})

    for i in range(4):
        t = f"downsample_layers.{i}"
        # layer 0 = [conv, LN]; layers 1-3 = [LN, conv]
        conv_idx, norm_idx = (0, 1) if i == 0 else (1, 0)
        if f"{t}.{conv_idx}.weight" not in sd:
            continue
        _set(params, (f"downsample{i}_conv", "conv", "kernel"),
             sd[f"{t}.{conv_idx}.weight"].transpose(_CONV_T))
        _set(params, (f"downsample{i}_conv", "conv", "bias"),
             sd[f"{t}.{conv_idx}.bias"])
        handled.update({f"{t}.{conv_idx}.weight", f"{t}.{conv_idx}.bias"})
        ln(f"{t}.{norm_idx}", (f"downsample{i}_norm",))

        blk = re.compile(rf"stages\.{i}\.(\d+)\.")
        n_blocks = 1 + max((int(m.group(1)) for k in sd
                            if (m := blk.match(k))), default=-1)
        for j in range(n_blocks):
            t2 = f"stages.{i}.{j}"
            f = (f"stage{i}_block{j}",)
            # mmcls depthwise conv weight (C, 1, 7, 7)
            _set(params, f + ("depthwise_conv", "kernel"),
                 sd[f"{t2}.depthwise_conv.weight"].transpose(_CONV_T))
            _set(params, f + ("depthwise_conv", "bias"),
                 sd[f"{t2}.depthwise_conv.bias"])
            handled.update({f"{t2}.depthwise_conv.weight",
                            f"{t2}.depthwise_conv.bias"})
            ln(f"{t2}.norm", f + ("norm",))
            _dense(params, sd, f"{t2}.pointwise_conv1",
                   f + ("pointwise_conv1",), handled)
            _dense(params, sd, f"{t2}.pointwise_conv2",
                   f + ("pointwise_conv2",), handled)
            if f"{t2}.gamma" in sd:
                _set(params, f + ("gamma",), sd[f"{t2}.gamma"])
                handled.add(f"{t2}.gamma")
        if f"norm{i}.weight" in sd:
            ln(f"norm{i}", (f"out_norm{i}",))

    leftovers = [k for k in sd if k not in handled
                 and not k.startswith("head")]
    return {"params": params}, leftovers
