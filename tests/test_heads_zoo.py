"""Forward smoke tests for the zoo decode heads / necks / cascade segmentor
(the reference's tests/test_models/test_heads pattern: construct the module,
drive a tiny random input, assert output shape + finiteness)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import peanut_tpu.models  # noqa: F401  (registers everything)
from peanut_tpu.registry import HEADS, NECKS, SEGMENTORS


def _feats(channels, hw=8, b=2, seed=0):
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.rand(b, hw, hw, c).astype(np.float32))
            for c in channels]


def _run_head(name, cfg, channels, hw=8):
    head = HEADS.get(name)(**cfg)
    feats = _feats(channels, hw=hw)
    variables = head.init({"params": jax.random.PRNGKey(0)}, feats,
                          train=False)
    out = head.apply(variables, feats, train=False)
    k = cfg.get("num_classes", 19)
    assert out.shape[0] == feats[0].shape[0] and out.shape[-1] == k
    assert np.isfinite(np.asarray(out)).all()
    return out


CASES = [
    ("ANNHead", dict(in_channels=(32, 64), channels=16, project_channels=8,
                     num_classes=5, in_index=(0, 1),
                     key_pool_scales=(1, 3)), (32, 64)),
    ("APCHead", dict(in_channels=64, channels=16, num_classes=5, in_index=1,
                     pool_scales=(1, 2, 3)), (32, 64)),
    ("DMHead", dict(in_channels=64, channels=16, num_classes=5, in_index=1,
                    filter_sizes=(1, 3)), (32, 64)),
    ("EMAHead", dict(in_channels=64, channels=16, ema_channels=16,
                     num_bases=8, num_stages=2, num_classes=5, in_index=1),
     (32, 64)),
    ("EncHead", dict(in_channels=(32, 64), channels=16, num_codes=4,
                     num_classes=5, in_index=(0, 1), add_lateral=True),
     (32, 64)),
    ("DNLHead", dict(in_channels=64, channels=16, num_classes=5, in_index=1),
     (32, 64)),
    ("ISAHead", dict(in_channels=64, channels=16, isa_channels=8,
                     down_factor=(2, 2), num_classes=5, in_index=1),
     (32, 64)),
    ("LRASPPHead", dict(in_channels=(16, 32, 64), channels=16, num_classes=5,
                        in_index=(0, 1, 2)), (16, 32, 64)),
    ("FPNHead", dict(in_channels=(16, 16, 16, 16), channels=16, num_classes=5,
                     feature_strides=(4, 8, 16, 32),
                     in_index=(0, 1, 2, 3)), (16, 16, 16, 16)),
    ("DepthwiseSeparableFCNHead", dict(in_channels=32, channels=16,
                                       num_classes=5, in_index=0), (32,)),
    ("PSAHead", dict(in_channels=64, channels=16, mask_channels=8,
                     num_classes=5, in_index=1), (32, 64)),
    ("CCHead", dict(in_channels=64, channels=16, num_classes=5, in_index=1),
     (32, 64)),
    ("SETRUPHead", dict(in_channels=32, channels=16, num_classes=5,
                        num_convs=1, up_scale=2, in_index=0), (32,)),
    ("SETRMLAHead", dict(in_channels=(16, 16), channels=16, mla_channels=8,
                         num_classes=5, up_scale=2, in_index=(0, 1)),
     (16, 16)),
    ("SegmenterMaskTransformerHead", dict(in_channels=32, channels=32,
                                          num_layers=1, num_heads=4,
                                          num_classes=5, in_index=0), (32,)),
    ("STDCHead", dict(in_channels=32, channels=16, num_classes=2, in_index=0),
     (32,)),
    ("DPTHead", dict(in_channels=(16, 16, 16, 16), channels=16,
                     post_process_channels=(8, 8, 16, 16), num_classes=5,
                     in_index=(0, 1, 2, 3)), (16, 16, 16, 16)),
]


@pytest.mark.parametrize("name,cfg,channels",
                         CASES, ids=[c[0] for c in CASES])
def test_zoo_head_forward(name, cfg, channels):
    _run_head(name, cfg, channels)


def test_stdc_detail_target():
    from peanut_tpu.models.heads_zoo import STDCHead
    gt = jnp.zeros((1, 16, 16), jnp.int32).at[:, 4:12, 4:12].set(1)
    detail = STDCHead.detail_target(gt)
    assert detail.shape == (1, 16, 16)
    d = np.asarray(detail)
    assert d[0, 4, 4] == 1 and d[0, 8, 8] == 0 and d[0, 0, 0] == 0


def test_point_sample_matches_center_pixels():
    from peanut_tpu.models.heads_zoo import point_sample
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(1, 4, 4, 3).astype(np.float32))
    # pixel centers: exact values
    pts = jnp.asarray([[[(x + 0.5) / 4, (y + 0.5) / 4]
                        for y in range(4) for x in range(4)]])
    out = np.asarray(point_sample(feats, pts)).reshape(4, 4, 3)
    np.testing.assert_allclose(out, np.asarray(feats)[0], rtol=1e-5)


@pytest.mark.parametrize("name,cfg,channels", [
    ("MLANeck", dict(in_channels=(16, 16), out_channels=8), (16, 16)),
    ("MultiLevelNeck", dict(in_channels=(16,), out_channels=8,
                            scales=(0.5, 1, 2)), (16,)),
    ("JPU", dict(in_channels=(16, 32, 64), mid_channels=8,
                 dilations=(1, 2)), (16, 32, 64)),
    ("ICNeck", dict(in_channels=(16, 32, 64), out_channels=8),
     (16, 32, 64)),
    ("Feature2Pyramid", dict(embed_dim=16, rescales=(2, 1, 0.5)),
     (16, 16, 16)),
], ids=["MLANeck", "MultiLevelNeck", "JPU", "ICNeck", "Feature2Pyramid"])
def test_neck_forward(name, cfg, channels):
    neck = NECKS.get(name)(**cfg)
    feats = _feats(channels)
    variables = neck.init({"params": jax.random.PRNGKey(0)}, feats,
                          train=False)
    outs = neck.apply(variables, feats, train=False)
    assert isinstance(outs, tuple) and len(outs) >= 2
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def _tiny_backbone_cfg():
    return dict(type="ResNetV1c", depth=50, num_stages=4,
                out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                strides=(1, 2, 1, 1), contract_dilation=True,
                base_channels=8, stem_channels=8, in_channels=3)


@pytest.mark.slow
def test_cascade_ocr_forward():
    cfg = dict(
        num_stages=2,
        backbone=_tiny_backbone_cfg(),
        decode_head=[
            dict(type="FCNHead", in_channels=128, in_index=2, channels=8,
                 num_convs=1, num_classes=5),
            dict(type="OCRHead", in_channels=256, in_index=3, channels=8,
                 ocr_channels=8, num_classes=5),
        ],
        test_cfg=dict(mode="whole"),
    )
    model = SEGMENTORS.get("CascadeEncoderDecoder")(**cfg)
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(1, 32, 32, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    outs = model.apply(variables, x, train=False)
    assert isinstance(outs, tuple) and len(outs) == 2
    for o in outs:
        assert o.shape == (1, 32, 32, 5)
    logits = model.apply(variables, x, method=model.inference)
    assert logits.shape == (1, 32, 32, 5)


def test_cascade_pointrend_inference():
    cfg = dict(
        num_stages=2,
        backbone=_tiny_backbone_cfg(),
        decode_head=[
            dict(type="FPNHead", in_channels=(32, 64, 128, 256), channels=8,
                 feature_strides=(4, 4, 4, 4), in_index=(0, 1, 2, 3),
                 num_classes=5),
            dict(type="PointHead", in_channels=(32,), channels=8, num_fcs=2,
                 in_index=(0,), num_classes=5),
        ],
        test_cfg=dict(mode="whole", subdivision_steps=1,
                      subdivision_num_points=16, scale_factor=2),
    )
    model = SEGMENTORS.get("CascadeEncoderDecoder")(**cfg)
    x = jnp.asarray(np.random.RandomState(1)
                    .rand(1, 32, 32, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    logits = model.apply(variables, x, method=model.inference)
    assert logits.shape == (1, 32, 32, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_knet_head_forward():
    _run_head("IterativeDecodeHead",
              dict(in_channels=64, channels=16, num_stages=2, num_heads=2,
                   feedforward_channels=32, num_classes=5, in_index=1),
              (32, 64))


def test_timm_adapter():
    from peanut_tpu.registry import BACKBONES
    bb = BACKBONES.get("TIMMBackbone")(
        model_name="resnet18", extra=dict(base_channels=8, stem_channels=8))
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    outs = bb.apply(variables, x, train=False)
    assert len(outs) == 4

    with pytest.raises(NotImplementedError):
        BACKBONES.get("TIMMBackbone")(model_name="efficientnet_b0").init(
            {"params": jax.random.PRNGKey(0)}, x, train=False)


def test_accuracy():
    from peanut_tpu.models.losses import accuracy
    pred = jnp.asarray([[[10.0, 1.0, 0.0], [1.0, 10.0, 5.0]]])  # (1,2,3)
    target = jnp.asarray([[0, 2]])
    assert float(accuracy(pred, target)) == 50.0
    a1, a2 = accuracy(pred, target, topk=(1, 2))
    assert float(a1) == 50.0 and float(a2) == 100.0
    # threshold gates low-score predictions
    assert float(accuracy(pred, target, thresh=20.0)) == 0.0
    # ignore_index drops pixels from the denominator
    assert float(accuracy(pred, target, ignore_index=2)) == 100.0
