"""Checkpoint I/O: torch ``.pth`` import and orbax-backed native checkpoints.

The reference ships its models as torch state dicts (nav/pred_model_wts.pth,
mask_rcnn_R_101_cat9.pth; loaded at mmseg/apis/inference.py:12-40 and via
detectron2 DetectionCheckpointer).  ``load_torch_state_dict`` +
``convert_encoder_decoder_state`` turn an mmseg EncoderDecoder state dict
into this framework's flax variables (NHWC/HWIO layout), so reference
weights drop straight into the TPU models.  torch is imported lazily and only
here — never on the compute path.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into {name: numpy array}.

    Handles every wrapper the reference's checkpoints use:
      * bare state dicts;
      * mmcv-style ``{'state_dict': ..., 'meta': {...}}`` (pred_model_wts.pth,
        written by mmcv CheckpointHook — reference load site
        mmseg/apis/inference.py:12-40);
      * detectron2-style ``{'model': ..., 'optimizer': ..., 'iteration': ...}``
        (mask_rcnn_R_101_cat9.pth, written by DetectionCheckpointer);
      * ``module.`` prefixes from DataParallel/DDP-wrapped saves.
    """
    import torch  # lazy: converter-only dependency

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        if "state_dict" in obj:
            obj = obj["state_dict"]
        elif "model" in obj and isinstance(obj["model"], dict):
            obj = obj["model"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            if k.startswith("module."):
                k = k[len("module."):]
            out[k] = v.detach().cpu().numpy()
    return out


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_CONV_T = (2, 3, 1, 0)  # OIHW -> HWIO


def convert_encoder_decoder_state(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert an mmseg EncoderDecoder state dict to flax variables.

    Covers ResNet/ResNetV1c backbones, PSPHead, FCNHead (the PEANUT model;
    weight names per the reference's torch modules).  Returns
    {'params': ..., 'batch_stats': ...}.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_conv(flax_path, w):
        _set(params, flax_path + ("conv", "kernel"), w.transpose(_CONV_T))

    def put_bn(flax_prefix, torch_prefix):
        m = flax_prefix + ("bn",)
        _set(params, m + ("scale",), sd[torch_prefix + ".weight"])
        _set(params, m + ("bias",), sd[torch_prefix + ".bias"])
        _set(stats, m + ("mean",), sd[torch_prefix + ".running_mean"])
        _set(stats, m + ("var",), sd[torch_prefix + ".running_var"])

    handled = set()

    for key in sd:
        if key.endswith("num_batches_tracked"):
            handled.add(key)

    # --- backbone stem (v1c: Sequential conv,bn,relu x3; v1b: conv1/bn1) ---
    for k in range(3):
        tkey = f"backbone.stem.{3 * k}.weight"
        if tkey in sd:
            put_conv(("backbone", f"stem{k}", "conv_unit"), sd[tkey])
            put_bn(("backbone", f"stem{k}", "norm"), f"backbone.stem.{3 * k + 1}")
            handled.update({tkey} | {
                f"backbone.stem.{3 * k + 1}.{s}" for s in
                ("weight", "bias", "running_mean", "running_var")})
    if "backbone.conv1.weight" in sd:
        put_conv(("backbone", "conv1"), sd["backbone.conv1.weight"])
        put_bn(("backbone", "bn1"), "backbone.bn1")
        handled.update({"backbone.conv1.weight"} | {
            f"backbone.bn1.{s}" for s in
            ("weight", "bias", "running_mean", "running_var")})

    # --- residual stages ---
    layer_re = re.compile(
        r"backbone\.layer(\d+)\.(\d+)\.(conv\d|bn\d|downsample\.0|downsample\.1)"
        r"\.(weight|bias|running_mean|running_var)$")
    for key in sd:
        m = layer_re.match(key)
        if not m:
            continue
        li, bj, part, leaf = m.group(1), m.group(2), m.group(3), m.group(4)
        block = ("backbone", f"layer{li}_{bj}")
        if part.startswith("conv"):
            put_conv(block + (part,), sd[key])
        elif part == "downsample.0":
            put_conv(block + ("downsample_conv",), sd[key])
        elif part == "downsample.1":
            if leaf == "weight":
                put_bn(block + ("downsample_bn",),
                       f"backbone.layer{li}.{bj}.downsample.1")
        else:  # bnN
            if leaf == "weight":
                put_bn(block + (part,), f"backbone.layer{li}.{bj}.{part}")
        handled.add(key)

    # --- PSP decode head ---
    psp_re = re.compile(r"decode_head\.psp_modules\.(\d+)\.1\.(conv|bn)\.")
    for key in sd:
        m = psp_re.match(key)
        if not m:
            continue
        i = m.group(1)
        if m.group(2) == "conv":
            put_conv(("decode_head", f"ppm{i}", "conv_unit"), sd[key])
        elif key.endswith(".weight"):
            put_bn(("decode_head", f"ppm{i}", "norm"),
                   f"decode_head.psp_modules.{i}.1.bn")
        handled.add(key)

    def head_common(tprefix, fprefix, conv_names):
        for tname, fname in conv_names:
            wkey = f"{tprefix}.{tname}.conv.weight"
            if wkey in sd:
                put_conv((fprefix, fname, "conv_unit"), sd[wkey])
                put_bn((fprefix, fname, "norm"), f"{tprefix}.{tname}.bn")
                handled.update({wkey} | {
                    f"{tprefix}.{tname}.bn.{s}" for s in
                    ("weight", "bias", "running_mean", "running_var")})
        ck = f"{tprefix}.conv_seg.weight"
        if ck in sd:
            put_conv((fprefix, "conv_seg"), sd[ck])
            _set(params, (fprefix, "conv_seg", "conv", "bias"),
                 sd[f"{tprefix}.conv_seg.bias"])
            handled.update({ck, f"{tprefix}.conv_seg.bias"})

    head_common("decode_head", "decode_head", [("bottleneck", "bottleneck")])
    head_common("auxiliary_head", "auxiliary_head",
                [(f"convs.{i}", f"convs{i}") for i in range(8)]
                + [("conv_cat", "conv_cat")])

    leftovers = [k for k in sd if k not in handled
                 and not psp_re.match(k)
                 and not k.startswith("decode_head.psp_modules")]
    if leftovers:
        raise KeyError(f"Unconverted torch parameters: {leftovers[:10]}")

    return {"params": params, "batch_stats": stats}


# ----------------------------------------------------------------------
# Native (orbax) checkpointing for training
# ----------------------------------------------------------------------

def save_checkpoint(path: str, tree, step: int | None = None):
    """Save a pytree checkpoint with orbax (atomic, async-capable)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)
    if step is not None:
        with open(os.path.join(path, "STEP"), "w") as f:
            f.write(str(step))


def load_checkpoint(path: str, target=None):
    """Restore a checkpoint; pass ``target`` (a matching pytree of arrays)
    to recover custom node types (TrainState, optax states)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        import jax
        import numpy as _np

        target = jax.tree.map(_np.asarray, target)
        tree = ckptr.restore(os.path.abspath(path), item=target)
    else:
        tree = ckptr.restore(os.path.abspath(path))
    step_file = os.path.join(path, "STEP")
    step = None
    if os.path.exists(step_file):
        step = int(open(step_file).read().strip())
    return tree, step


def export_encoder_decoder_to_torch(variables, path: str):
    """Inverse of :func:`convert_encoder_decoder_state`: write the flax
    variables of a ResNet+PSP/FCN EncoderDecoder back out as an mmseg-format
    torch ``.pth`` (the reference's publish/interchange format)."""
    import torch

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd = {}

    def walk(tree, prefix):
        for key, val in tree.items():
            if isinstance(val, dict):
                walk(val, prefix + (key,))
            else:
                sd[prefix + (key,)] = np.asarray(val)

    walk(params, ())
    walk(stats, ())

    out = {}
    for fpath, arr in sd.items():
        name = _flax_path_to_torch_name(fpath)
        if name is None:
            continue
        if name.endswith(".weight") and arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        elif name.endswith(".weight") and arr.ndim == 2:
            arr = arr.T
        out[name] = __import__("torch").from_numpy(np.ascontiguousarray(arr))
    torch.save({"state_dict": out, "meta": {"exported_by": "peanut_tpu"}},
               path)
    return sorted(out)


def _flax_path_to_torch_name(path):
    """Map a flax tree path back to the mmseg torch parameter name."""
    import re as _re

    parts = list(path)
    if not parts:
        return None
    top = parts[0]
    # backbone stems / layers
    if top == "backbone":
        m = _re.match(r"stem(\d)", parts[1]) if len(parts) > 1 else None
        if m:
            k = int(m.group(1))
            if parts[2] == "conv_unit":
                return f"backbone.stem.{3 * k}.weight"
            leaf = parts[-1]
            suffix = {"scale": "weight", "bias": "bias",
                      "mean": "running_mean", "var": "running_var"}[leaf]
            return f"backbone.stem.{3 * k + 1}.{suffix}"
        m = _re.match(r"layer(\d+)_(\d+)", parts[1]) if len(parts) > 1 else None
        if m:
            li, bj = m.group(1), m.group(2)
            part = parts[2]
            leaf = parts[-1]
            if part.startswith("conv"):
                return f"backbone.layer{li}.{bj}.{part}.weight"
            if part == "downsample_conv":
                return f"backbone.layer{li}.{bj}.downsample.0.weight"
            bn_suffix = {"scale": "weight", "bias": "bias",
                         "mean": "running_mean", "var": "running_var"}[leaf]
            if part == "downsample_bn":
                return f"backbone.layer{li}.{bj}.downsample.1.{bn_suffix}"
            return f"backbone.layer{li}.{bj}.{part}.{bn_suffix}"
        return None
    if top in ("decode_head", "auxiliary_head"):
        sub = parts[1]
        leaf = parts[-1]
        bn_suffix = {"scale": "weight", "bias": "bias",
                     "mean": "running_mean", "var": "running_var"}.get(leaf)
        m = _re.match(r"ppm(\d+)", sub)
        if m:
            i = m.group(1)
            if parts[2] == "conv_unit":
                return f"{top}.psp_modules.{i}.1.conv.weight"
            return f"{top}.psp_modules.{i}.1.bn.{bn_suffix}"
        m = _re.match(r"convs(\d+)", sub)
        if m:
            i = m.group(1)
            if parts[2] == "conv_unit":
                return f"{top}.convs.{i}.conv.weight"
            return f"{top}.convs.{i}.bn.{bn_suffix}"
        if sub == "bottleneck":
            if parts[2] == "conv_unit":
                return f"{top}.bottleneck.conv.weight"
            return f"{top}.bottleneck.bn.{bn_suffix}"
        if sub == "conv_seg":
            return f"{top}.conv_seg.{'weight' if leaf == 'kernel' else 'bias'}"
        return None
    return None


def find_latest_checkpoint(work_dir: str):
    """Locate the newest iter_*/ checkpoint in a work dir (mmseg
    misc.py:find_latest_checkpoint parity for resume)."""
    if not os.path.isdir(work_dir):
        return None
    cands = [d for d in os.listdir(work_dir) if d.startswith("iter_")]
    if not cands:
        return None
    latest = max(cands, key=lambda d: int(d.split("_")[1]))
    return os.path.join(work_dir, latest)
