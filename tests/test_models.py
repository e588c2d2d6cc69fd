"""Model-zoo parity tests: flax models + torch-weight converter vs oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peanut_tpu.models import build_segmentor, init_segmentor_params
from peanut_tpu.models.ops import resize_bilinear, adaptive_avg_pool
from peanut_tpu.core import convert_encoder_decoder_state

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from torch_pspnet_oracle import OraclePSPNet, randomize_bn_stats  # noqa: E402


# ----------------------------------------------------------------------
# ops parity
# ----------------------------------------------------------------------

@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("size", [(7, 9), (30, 17), (64, 64)])
def test_resize_bilinear_matches_torch(rng, align_corners, size):
    x = rng.randn(2, 13, 11, 3).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), size,
                         mode="bilinear", align_corners=align_corners)
    got = np.asarray(resize_bilinear(x, size, align_corners=align_corners))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("out", [1, 2, 3, 6, 5])
def test_adaptive_avg_pool_matches_torch(rng, out):
    x = rng.randn(2, 17, 13, 4).astype(np.float32)
    want = F.adaptive_avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), out)
    got = np.asarray(adaptive_avg_pool(x, out))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want.numpy(),
                               rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------------------
# full-model parity through the weight converter
# ----------------------------------------------------------------------

def small_pspnet_config(base=16):
    return dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=50, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                      strides=(1, 2, 1, 1), contract_dilation=True,
                      base_channels=base, stem_channels=base, in_channels=14),
        decode_head=dict(type="PSPHead", in_channels=base * 32,
                         in_index=3, channels=base * 8,
                         pool_scales=(1, 2, 3, 6), dropout_ratio=0.1,
                         num_classes=6, align_corners=False),
        auxiliary_head=dict(type="FCNHead", in_channels=base * 16, in_index=2,
                            channels=base * 4, num_convs=1, concat_input=False,
                            dropout_ratio=0.1, num_classes=6,
                            align_corners=False),
        test_cfg=dict(mode="whole"),
    )


def tree_paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= tree_paths(v, prefix + (k,))
        else:
            out.add(prefix + (k,))
    return out


@pytest.fixture(scope="module")
def oracle_and_flax():
    rng = np.random.RandomState(42)
    with torch.no_grad():
        oracle = OraclePSPNet(base=16)
        oracle.eval()
        randomize_bn_stats(oracle, rng)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    variables = convert_encoder_decoder_state(sd)
    model = build_segmentor(small_pspnet_config(16))
    return oracle, model, variables


def test_converted_tree_matches_init_structure(oracle_and_flax):
    _, model, variables = oracle_and_flax
    init_vars = init_segmentor_params(model, (1, 32, 32, 14))
    got = tree_paths(jax.tree.map(lambda x: None, variables))
    want = tree_paths(jax.tree.map(lambda x: None,
                                   {k: dict(v) for k, v in init_vars.items()}))
    assert got == want, (
        f"missing: {sorted(want - got)[:5]} extra: {sorted(got - want)[:5]}")
    # shapes agree too
    flat_a = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(init_vars)[0])
    for k in flat_b:
        assert np.shape(flat_a[k]) == np.shape(flat_b[k]), k


def test_pspnet_forward_matches_oracle(oracle_and_flax, rng):
    oracle, model, variables = oracle_and_flax
    x = rng.rand(1, 14, 64, 64).astype(np.float32)
    with torch.no_grad():
        want, want_aux = oracle(torch.from_numpy(x), with_aux=True)
    got, got_aux = model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
        with_aux=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_aux).transpose(0, 3, 1, 2),
                               want_aux.numpy(), rtol=1e-3, atol=1e-3)


def test_inference_returns_raw_logits(oracle_and_flax, rng):
    """PEANUT logit-passthrough semantics (encoder_decoder.py:248,263)."""
    oracle, model, variables = oracle_and_flax
    x = jnp.asarray(rng.rand(1, 48, 48, 14).astype(np.float32))
    logits = model.apply(variables, x, method=model.inference)
    assert logits.shape == (1, 48, 48, 6)
    # raw logits: values outside [0, 1] must exist (not probabilities)
    assert float(jnp.max(jnp.abs(logits))) > 1.0 or float(jnp.min(logits)) < 0.0


@pytest.mark.slow
def test_slide_inference_matches_whole_on_uniform(rng):
    cfg = small_pspnet_config(16)
    cfg["test_cfg"] = dict(mode="slide", stride=(16, 16), crop_size=(32, 32))
    model = build_segmentor(cfg)
    variables = init_segmentor_params(model, (1, 32, 32, 14))
    x = jnp.asarray(rng.rand(1, 48, 48, 14).astype(np.float32))
    out = model.apply(variables, x, method=model.inference)
    assert out.shape == (1, 48, 48, 6)
    assert np.isfinite(np.asarray(out)).all()
