"""Weight-importer validation against the REAL checkpoint key manifests.

The reference ships two torch checkpoints (never available in this sandbox):
  * ``nav/pred_model_wts.pth``  — mmseg PSPNet-R50v1c, mmcv CheckpointHook
    format ``{'state_dict': ..., 'meta': {'CLASSES', 'PALETTE', ...}}``
    (load site: /root/reference/prediction/mmseg/apis/inference.py:12-40);
  * ``nav/agent/utils/mask_rcnn_R_101_cat9.pth`` — detectron2
    DetectionCheckpointer format ``{'model': ..., 'optimizer': ...,
    'iteration': ...}`` (load site:
    /root/reference/nav/agent/utils/segmentation.py:38, model names per
    mask_rcnn_R_101_cat9.yaml R101-FPN / GeneralizedRCNN conventions).

These tests synthesize full-fidelity state dicts with the EXACT key sets and
shapes those files contain — derived independently from the torch/detectron2
module naming rules, NOT from our own flax trees — wrap them in the real
on-disk formats (incl. ``module.`` DataParallel prefixes and
num_batches_tracked buffers), and assert both converters consume them with
zero leftovers into trees that exactly match the flax models' init
structure.  Any naming drift now fails here instead of in production.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peanut_tpu.core.checkpoint import (convert_encoder_decoder_state,
                                        load_torch_state_dict)
from peanut_tpu.models.d2_import import convert_d2_maskrcnn_state

R50_BLOCKS = (3, 4, 6, 3)
R101_BLOCKS = (3, 4, 23, 3)
STAGE_PLANES = (64, 128, 256, 512)


# ----------------------------------------------------------------------
# manifest generators (torch naming conventions, written out explicitly)
# ----------------------------------------------------------------------

def mmseg_pspnet_r50v1c_manifest(in_ch=14, num_classes=6):
    """Every key of torch ``model.state_dict()`` for the reference's
    PSPNet-R50v1c (pred_model_cfg.py:2-42): ResNetV1c deep stem, 4 stages,
    PSPHead(512, pool 1/2/3/6) + FCNHead(256, num_convs=1,
    concat_input=False).  Values are shapes."""
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = (c,)
        sd[f"{prefix}.bias"] = (c,)
        sd[f"{prefix}.running_mean"] = (c,)
        sd[f"{prefix}.running_var"] = (c,)
        sd[f"{prefix}.num_batches_tracked"] = ()

    # ResNetV1c deep stem: nn.Sequential(conv,bn,relu x3) => indices 0..8
    sd["backbone.stem.0.weight"] = (32, in_ch, 3, 3)
    bn("backbone.stem.1", 32)
    sd["backbone.stem.3.weight"] = (32, 32, 3, 3)
    bn("backbone.stem.4", 32)
    sd["backbone.stem.6.weight"] = (64, 32, 3, 3)
    bn("backbone.stem.7", 64)

    in_c = 64
    for li, (nblocks, planes) in enumerate(zip(R50_BLOCKS, STAGE_PLANES), 1):
        out_c = planes * 4
        for b in range(nblocks):
            p = f"backbone.layer{li}.{b}"
            cin = in_c if b == 0 else out_c
            sd[f"{p}.conv1.weight"] = (planes, cin, 1, 1)
            bn(f"{p}.bn1", planes)
            sd[f"{p}.conv2.weight"] = (planes, planes, 3, 3)
            bn(f"{p}.bn2", planes)
            sd[f"{p}.conv3.weight"] = (out_c, planes, 1, 1)
            bn(f"{p}.bn3", out_c)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = (out_c, cin, 1, 1)
                bn(f"{p}.downsample.1", out_c)
        in_c = out_c

    for i in range(4):  # PPM: Sequential(AdaptiveAvgPool2d, ConvModule)
        sd[f"decode_head.psp_modules.{i}.1.conv.weight"] = (512, 2048, 1, 1)
        bn(f"decode_head.psp_modules.{i}.1.bn", 512)
    sd["decode_head.bottleneck.conv.weight"] = (512, 2048 + 4 * 512, 3, 3)
    bn("decode_head.bottleneck.bn", 512)
    sd["decode_head.conv_seg.weight"] = (num_classes, 512, 1, 1)
    sd["decode_head.conv_seg.bias"] = (num_classes,)

    sd["auxiliary_head.convs.0.conv.weight"] = (256, 1024, 3, 3)
    bn("auxiliary_head.convs.0.bn", 256)
    sd["auxiliary_head.conv_seg.weight"] = (num_classes, 256, 1, 1)
    sd["auxiliary_head.conv_seg.bias"] = (num_classes,)
    return sd


def d2_maskrcnn_r101_manifest(num_classes=9):
    """Every key of the detectron2 GeneralizedRCNN state dict for
    R101-FPN (mask_rcnn_R_101_cat9.yaml): caffe ResNet-101 with FrozenBN
    ('.norm.' buffers, no num_batches_tracked), FPN lateral/output convs,
    standard RPN head, 2-fc box head, 4-conv+deconv mask head, plus the
    pixel_mean/std and anchor cell buffers GeneralizedRCNN registers."""
    sd = {}

    def norm(prefix, c):
        for s in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{prefix}.{s}"] = (c,)

    sd["pixel_mean"] = (3, 1, 1)
    sd["pixel_std"] = (3, 1, 1)
    sd["backbone.bottom_up.stem.conv1.weight"] = (64, 3, 7, 7)
    norm("backbone.bottom_up.stem.conv1.norm", 64)

    in_c = 64
    for si, (nblocks, planes) in enumerate(zip(R101_BLOCKS, STAGE_PLANES), 2):
        out_c = planes * 4
        for b in range(nblocks):
            p = f"backbone.bottom_up.res{si}.{b}"
            cin = in_c if b == 0 else out_c
            if b == 0:
                sd[f"{p}.shortcut.weight"] = (out_c, cin, 1, 1)
                norm(f"{p}.shortcut.norm", out_c)
            sd[f"{p}.conv1.weight"] = (planes, cin, 1, 1)
            norm(f"{p}.conv1.norm", planes)
            sd[f"{p}.conv2.weight"] = (planes, planes, 3, 3)
            norm(f"{p}.conv2.norm", planes)
            sd[f"{p}.conv3.weight"] = (out_c, planes, 1, 1)
            norm(f"{p}.conv3.norm", out_c)
        in_c = out_c

    for lvl, cin in zip(range(2, 6), (256, 512, 1024, 2048)):
        sd[f"backbone.fpn_lateral{lvl}.weight"] = (256, cin, 1, 1)
        sd[f"backbone.fpn_lateral{lvl}.bias"] = (256,)
        sd[f"backbone.fpn_output{lvl}.weight"] = (256, 256, 3, 3)
        sd[f"backbone.fpn_output{lvl}.bias"] = (256,)

    for i in range(5):
        sd[f"proposal_generator.anchor_generator.cell_anchors.{i}"] = (3, 4)
    sd["proposal_generator.rpn_head.conv.weight"] = (256, 256, 3, 3)
    sd["proposal_generator.rpn_head.conv.bias"] = (256,)
    sd["proposal_generator.rpn_head.objectness_logits.weight"] = (3, 256, 1, 1)
    sd["proposal_generator.rpn_head.objectness_logits.bias"] = (3,)
    sd["proposal_generator.rpn_head.anchor_deltas.weight"] = (12, 256, 1, 1)
    sd["proposal_generator.rpn_head.anchor_deltas.bias"] = (12,)

    sd["roi_heads.box_head.fc1.weight"] = (1024, 256 * 7 * 7)
    sd["roi_heads.box_head.fc1.bias"] = (1024,)
    sd["roi_heads.box_head.fc2.weight"] = (1024, 1024)
    sd["roi_heads.box_head.fc2.bias"] = (1024,)
    sd["roi_heads.box_predictor.cls_score.weight"] = (num_classes + 1, 1024)
    sd["roi_heads.box_predictor.cls_score.bias"] = (num_classes + 1,)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = (num_classes * 4, 1024)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = (num_classes * 4,)

    for i in range(1, 5):
        sd[f"roi_heads.mask_head.mask_fcn{i}.weight"] = (256, 256, 3, 3)
        sd[f"roi_heads.mask_head.mask_fcn{i}.bias"] = (256,)
    sd["roi_heads.mask_head.deconv.weight"] = (256, 256, 2, 2)
    sd["roi_heads.mask_head.deconv.bias"] = (256,)
    sd["roi_heads.mask_head.predictor.weight"] = (num_classes, 256, 1, 1)
    sd["roi_heads.mask_head.predictor.bias"] = (num_classes,)
    return sd


def _materialize(manifest, rng):
    """shapes -> torch tensors (num_batches_tracked as int64 scalars,
    everything else float32)."""
    import torch

    out = {}
    for k, shape in manifest.items():
        if k.endswith("num_batches_tracked"):
            out[k] = torch.tensor(12345, dtype=torch.int64)
        else:
            out[k] = torch.from_numpy(
                rng.randn(*shape).astype(np.float32) * 0.05)
    return out


def _flat_shapes(tree, prefix=()):
    out = {}
    for k, v in dict(tree).items():
        if hasattr(v, "items"):
            out.update(_flat_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def _assert_same_structure(converted, init_vars):
    for col in ("params", "batch_stats"):
        got = _flat_shapes(converted.get(col, {}))
        want = _flat_shapes(init_vars.get(col, {}))
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        assert not missing, f"{col}: converter missed {missing[:8]}"
        assert not extra, f"{col}: converter invented {extra[:8]}"
        bad = [(p, got[p], want[p]) for p in want if got[p] != want[p]]
        assert not bad, f"{col}: shape mismatches {bad[:8]}"


# ----------------------------------------------------------------------
# mmseg PSPNet checkpoint (pred_model_wts.pth format)
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def prediction_init_vars():
    from peanut_tpu.models import build_segmentor, init_segmentor_params
    from peanut_tpu.models.builder import peanut_prediction_config

    model = build_segmentor(peanut_prediction_config())
    return init_segmentor_params(model, (1, 64, 64, 14))


def test_mmseg_manifest_mmcv_wrapper(tmp_path, rng, prediction_init_vars):
    import torch

    sd = _materialize(mmseg_pspnet_r50v1c_manifest(), rng)
    path = str(tmp_path / "pred_model_wts.pth")
    torch.save({"state_dict": sd,
                "meta": {"CLASSES": ("chair", "bed", "plant", "toilet",
                                     "tv_monitor", "sofa"),
                         "PALETTE": None,
                         "mmseg_version": "0.26.0"}}, path)
    loaded = load_torch_state_dict(path)
    assert "backbone.stem.0.weight" in loaded
    converted = convert_encoder_decoder_state(loaded)
    _assert_same_structure(converted, prediction_init_vars)
    # spot-check a value survives the OIHW->HWIO transpose
    w = np.asarray(sd["backbone.stem.0.weight"])
    np.testing.assert_allclose(
        converted["params"]["backbone"]["stem0"]["conv_unit"]["conv"]["kernel"],
        w.transpose(2, 3, 1, 0))


def test_mmseg_manifest_module_prefix(tmp_path, rng, prediction_init_vars):
    """DataParallel-wrapped saves prefix every key with ``module.``."""
    import torch

    sd = _materialize(mmseg_pspnet_r50v1c_manifest(), rng)
    path = str(tmp_path / "pred_model_wts_dp.pth")
    torch.save({"state_dict": {f"module.{k}": v for k, v in sd.items()},
                "meta": {"CLASSES": None}}, path)
    converted = convert_encoder_decoder_state(load_torch_state_dict(path))
    _assert_same_structure(converted, prediction_init_vars)


def test_mmseg_manifest_detects_drift(rng):
    """An unexpected key (naming drift) must raise, not silently drop."""
    manifest = mmseg_pspnet_r50v1c_manifest()
    manifest["decode_head.bottleneck_2.conv.weight"] = (512, 512, 3, 3)
    sd = {k: rng.randn(*s).astype(np.float32) if s else np.int64(1)
          for k, s in manifest.items()}
    with pytest.raises(KeyError):
        convert_encoder_decoder_state(sd)


# ----------------------------------------------------------------------
# detectron2 Mask R-CNN checkpoint (mask_rcnn_R_101_cat9.pth format)
# ----------------------------------------------------------------------

def test_d2_manifest_converts_clean(tmp_path, rng):
    """The full R101 d2 manifest in DetectionCheckpointer format converts
    with zero leftovers (buffers pixel_*/anchor cells are ignored)."""
    import torch

    sd = _materialize(d2_maskrcnn_r101_manifest(), rng)
    path = str(tmp_path / "mask_rcnn_R_101_cat9.pth")
    torch.save({"model": sd, "optimizer": {}, "scheduler": {},
                "iteration": 49999}, path)
    loaded = load_torch_state_dict(path)
    converted = convert_d2_maskrcnn_state(loaded)
    params = _flat_shapes(converted["params"])
    # R101: 3+4+23+3 = 33 bottleneck blocks x 3 convs + 4 shortcuts + stem
    n_backbone_convs = len([p for p in params
                            if p[0] == "backbone" and p[-1] == "kernel"])
    assert n_backbone_convs == 33 * 3 + 4 + 1
    assert ("box_predictor", "cls_score", "kernel") in params
    assert params[("box_predictor", "cls_score", "kernel")] == (1024, 10)
    assert params[("mask_head", "deconv", "kernel")] == (2, 2, 256, 256)


def test_d2_manifest_detects_drift(rng):
    manifest = d2_maskrcnn_r101_manifest()
    manifest["roi_heads.box_predictor.cls_score2.weight"] = (10, 1024)
    sd = {k: rng.randn(*s).astype(np.float32) for k, s in manifest.items()}
    with pytest.raises(KeyError):
        convert_d2_maskrcnn_state(sd)


@pytest.mark.slow
def test_d2_manifest_matches_init_structure(rng):
    """Converted R101 tree == flax MaskRCNN(depth=101) init structure."""
    from peanut_tpu.models.mask_rcnn import MaskRCNN

    sd = {k: rng.randn(*s).astype(np.float32) * 0.02
          for k, s in d2_maskrcnn_r101_manifest().items()}
    converted = convert_d2_maskrcnn_state(sd)

    model = MaskRCNN(num_classes=9, depth=101)
    img = jnp.zeros((64, 80, 3), jnp.float32)
    init_vars = jax.jit(
        lambda r, x: model.init(r, x, method=model.detect))(
        jax.random.PRNGKey(0), img)
    _assert_same_structure(converted, init_vars)
