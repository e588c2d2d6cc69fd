"""Forward smoke tests for the zoo backbones (the reference's
tests/test_models/test_backbones pattern): tiny configs, random input,
shape + finiteness checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import peanut_tpu.models  # noqa: F401
from peanut_tpu.registry import BACKBONES


def _run(name, cfg, in_ch=3, size=32, b=1, n_outs=None):
    bb = BACKBONES.get(name)(**cfg)
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(b, size, size, in_ch).astype(np.float32))
    variables = jax.jit(
        lambda r, xx: bb.init({"params": r}, xx, train=False))(
        jax.random.PRNGKey(0), x)
    outs = bb.apply(variables, x, train=False)
    assert isinstance(outs, tuple)
    if n_outs is not None:
        assert len(outs) == n_outs
    for o in outs:
        assert o.shape[0] == b
        assert np.isfinite(np.asarray(o)).all()
    return outs


@pytest.mark.slow
def test_resnext():
    outs = _run("ResNeXt", dict(depth=50, groups=4, base_width=4,
                                base_channels=16, stem_channels=16),
                n_outs=4)
    assert outs[-1].shape[-1] == 16 * 8 * 4  # planes*expansion at stage 4


@pytest.mark.slow
def test_resnest():
    outs = _run("ResNeSt", dict(depth=50, base_channels=8, stem_channels=8,
                                radix=2), n_outs=4)
    assert outs[0].shape[1] == 8  # stride 4


@pytest.mark.slow
def test_mobilenet_v3():
    outs = _run("MobileNetV3", dict(arch="small", out_indices=(0, 1, 12)),
                n_outs=3)
    assert outs[-1].shape[-1] == 576
    _run("MobileNetV3", dict(arch="large", out_indices=(1, 3, 16)), n_outs=3)


@pytest.mark.slow
def test_fast_scnn():
    higher, lower, fusion = _run("FastSCNN", dict(), size=64, n_outs=3)
    assert higher.shape[1] == 8 and lower.shape[1] == 2
    assert fusion.shape[1] == 8 and fusion.shape[-1] == 128


@pytest.mark.slow
def test_cgnet():
    outs = _run("CGNet", dict(num_blocks=(2, 2)), size=64, n_outs=3)
    assert outs[0].shape[1] == 32 and outs[1].shape[1] == 16
    assert outs[2].shape[1] == 8


@pytest.mark.slow
def test_erfnet():
    (out,) = _run("ERFNet", dict(enc_stage_non_bottlenecks=(2, 2),
                                 dec_stages_non_bottleneck=(1, 1)),
                  size=64, n_outs=1)
    assert out.shape[1] == 32 and out.shape[-1] == 16


@pytest.mark.slow
def test_bisenetv1():
    outs = _run("BiSeNetV1",
                dict(backbone_cfg=dict(type="ResNet", depth=18,
                                       base_channels=8, stem_channels=8),
                     spatial_channels=(8, 8, 8, 16),
                     context_channels=(16, 32, 64), out_channels=32),
                size=64, n_outs=3)
    assert outs[0].shape[1] == 8 and outs[0].shape[-1] == 32


@pytest.mark.slow
def test_bisenetv2():
    outs = _run("BiSeNetV2", dict(detail_channels=(8, 8, 16),
                                  semantic_channels=(4, 8, 16, 32),
                                  bga_channels=16), size=64, n_outs=5)
    assert outs[0].shape[1] == 8 and outs[0].shape[-1] == 16


@pytest.mark.slow
def test_stdc():
    outs = _run("STDCNet", dict(channels=(8, 8, 16, 32, 64)), size=64,
                n_outs=5)
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]
    assert outs[2].shape[-1] == 16  # cat of progressive widths

    ctx = _run("STDCContextPathNet",
               dict(backbone_cfg=dict(type="STDCNet",
                                      channels=(8, 8, 16, 32, 64)),
                    out_channels=16, ffm_channels=32), size=64, n_outs=4)
    assert ctx[0].shape[1] == 8 and ctx[0].shape[-1] == 32


@pytest.mark.slow
def test_icnet():
    outs = _run("ICNet", dict(depth_blocks=(1, 1, 1, 1),
                              psp_out_channels=32,
                              out_channels=(8, 16, 16)), size=64, n_outs=3)
    assert outs[0].shape[-1] == 8
    assert outs[1].shape[-1] == 16 and outs[2].shape[-1] == 16


@pytest.mark.slow
def test_twins():
    outs = _run("PCPVT", dict(embed_dims=(8, 16, 32, 64),
                              num_heads=(1, 2, 4, 8), depths=(1, 1, 1, 1),
                              mlp_ratios=(2, 2, 2, 2)), size=64, n_outs=4)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    _run("SVT", dict(embed_dims=(8, 16, 32, 64), num_heads=(1, 2, 4, 8),
                     depths=(2, 2, 2, 2), windows=(2, 2, 2, 2),
                     mlp_ratios=(2, 2, 2, 2)), size=64, n_outs=4)


def test_beit_mae():
    outs = _run("BEiT", dict(embed_dim=16, depth=2, num_heads=2,
                             patch_size=8, out_indices=(0, 1)), size=32,
                n_outs=2)
    assert outs[0].shape[1] == 16  # 4x upscaled tap
    outs = _run("MAE", dict(embed_dim=16, depth=2, num_heads=2,
                            patch_size=8, out_indices=(0, 1)), size=32,
                n_outs=2)
    assert outs[1].shape[1] == 8
