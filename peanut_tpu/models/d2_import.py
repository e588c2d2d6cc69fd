"""detectron2 Mask R-CNN checkpoint -> flax MaskRCNN variables.

Converts the reference's ``mask_rcnn_R_101_cat9.pth`` (detectron2
GeneralizedRCNN state-dict naming) into the peanut_tpu.models.mask_rcnn
parameter tree.  Layout changes: conv OIHW -> HWIO, linear (out, in) ->
(in, out), deconv (in, out, kh, kw) -> (kh, kw, in, out), FrozenBN stats ->
batch_stats.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

_CONV_T = (2, 3, 1, 0)


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_d2_maskrcnn_state(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    handled = set()

    def conv(tkey, fpath, bias=False):
        _set(params, fpath + ("conv", "kernel"),
             sd[tkey + ".weight"].transpose(_CONV_T))
        handled.add(tkey + ".weight")
        if bias:
            _set(params, fpath + ("conv", "bias"), sd[tkey + ".bias"])
            handled.add(tkey + ".bias")

    def frozen_bn(tkey, fpath):
        m = fpath + ("bn",)
        _set(params, m + ("scale",), sd[tkey + ".weight"])
        _set(params, m + ("bias",), sd[tkey + ".bias"])
        _set(stats, m + ("mean",), sd[tkey + ".running_mean"])
        _set(stats, m + ("var",), sd[tkey + ".running_var"])
        handled.update(f"{tkey}.{s}" for s in
                       ("weight", "bias", "running_mean", "running_var"))

    def dense(tkey, fpath):
        _set(params, fpath + ("kernel",), sd[tkey + ".weight"].T)
        _set(params, fpath + ("bias",), sd[tkey + ".bias"])
        handled.update({tkey + ".weight", tkey + ".bias"})

    # stem
    conv("backbone.bottom_up.stem.conv1", ("backbone", "conv1"))
    frozen_bn("backbone.bottom_up.stem.conv1.norm", ("backbone", "bn1"))

    # residual stages: res{2..5}.{j}
    block_re = re.compile(
        r"backbone\.bottom_up\.res(\d)\.(\d+)\.(conv\d|shortcut)\.weight$")
    for key in list(sd):
        m = block_re.match(key)
        if not m:
            continue
        stage, j, part = int(m.group(1)), m.group(2), m.group(3)
        blk = ("backbone", f"layer{stage - 1}_{j}")
        tbase = f"backbone.bottom_up.res{stage}.{j}.{part}"
        if part == "shortcut":
            conv(tbase, blk + ("downsample_conv",))
            frozen_bn(tbase + ".norm", blk + ("downsample_bn",))
        else:
            conv(tbase, blk + (part,))
            frozen_bn(tbase + ".norm", blk + (part.replace("conv", "bn"),))

    # FPN
    for lvl in range(2, 6):
        conv(f"backbone.fpn_lateral{lvl}", ("fpn", f"lateral{lvl}"), bias=True)
        conv(f"backbone.fpn_output{lvl}", ("fpn", f"output{lvl}"), bias=True)

    # RPN head
    conv("proposal_generator.rpn_head.conv", ("rpn_head", "conv"), bias=True)
    conv("proposal_generator.rpn_head.objectness_logits",
         ("rpn_head", "objectness"), bias=True)
    conv("proposal_generator.rpn_head.anchor_deltas",
         ("rpn_head", "deltas"), bias=True)

    # box head + predictor
    dense("roi_heads.box_head.fc1", ("box_head", "fc1"))
    dense("roi_heads.box_head.fc2", ("box_head", "fc2"))
    dense("roi_heads.box_predictor.cls_score", ("box_predictor", "cls_score"))
    dense("roi_heads.box_predictor.bbox_pred", ("box_predictor", "bbox_pred"))

    # mask head
    for i in range(1, 5):
        conv(f"roi_heads.mask_head.mask_fcn{i}",
             ("mask_head", f"mask_fcn{i}"), bias=True)
    # torch ConvTranspose2d scatters with the unmirrored kernel; flax/lax
    # conv_transpose runs a regular conv over a zero-dilated input, so the
    # kernel must be spatially flipped: (in, out, kh, kw) -> flip(kh, kw)
    # -> (kh, kw, in, out).
    w = sd["roi_heads.mask_head.deconv.weight"]
    _set(params, ("mask_head", "deconv", "kernel"),
         np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)))
    _set(params, ("mask_head", "deconv", "bias"),
         sd["roi_heads.mask_head.deconv.bias"])
    handled.update({"roi_heads.mask_head.deconv.weight",
                    "roi_heads.mask_head.deconv.bias"})
    conv("roi_heads.mask_head.predictor", ("mask_head", "predictor"),
         bias=True)

    leftovers = [k for k in sd
                 if k not in handled and not k.endswith("num_batches_tracked")
                 and "anchor_generator" not in k
                 and not k.startswith("pixel_")]
    if leftovers:
        raise KeyError(f"Unconverted d2 parameters: {leftovers[:8]}")
    return {"params": params, "batch_stats": stats}
