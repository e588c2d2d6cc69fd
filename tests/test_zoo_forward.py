"""Zoo forward smoke tests (the reference's test_forward.py pattern):
build each config, init on a tiny input, run inference, check shapes."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peanut_tpu.core.config_file import load_config
from peanut_tpu.models import build_segmentor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# shrink heavy backbones for CI speed
SHRINK = {
    "ResNetV1c": dict(base_channels=16, stem_channels=16),
    "ResNet": dict(base_channels=16, stem_channels=16),
}


def shrink_cfg(model_cfg):
    def copy(v):
        if isinstance(v, dict):
            return dict(v)
        if isinstance(v, list):
            return [copy(e) for e in v]
        return v

    cfg = {k: copy(v) for k, v in model_cfg.items()}
    btype = cfg["backbone"].get("type")
    # configs that size their backbone explicitly are already CI-small
    if btype in SHRINK and "base_channels" not in cfg["backbone"]:
        cfg["backbone"].update(SHRINK[btype])
        for head_key in ("decode_head", "auxiliary_head"):
            heads = cfg.get(head_key)
            if not heads:
                continue
            for h in heads if isinstance(heads, list) else [heads]:
                scale = 16 / 64
                if isinstance(h.get("in_channels"), (list, tuple)):
                    h["in_channels"] = tuple(
                        int(c * scale) for c in h["in_channels"])
                elif "in_channels" in h:
                    h["in_channels"] = int(h["in_channels"] * scale)
                if "c1_in_channels" in h:
                    h["c1_in_channels"] = int(h["c1_in_channels"] * scale)
                h["channels"] = max(int(h.get("channels", 64) * scale), 8)
                if "ema_channels" in h:
                    h["ema_channels"] = max(
                        int(h["ema_channels"] * scale), 8)
    return cfg


@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(REPO, "configs/*/*.py"))))
@pytest.mark.slow
def test_zoo_config_forward(path):
    cfg = load_config(path)
    model_cfg = shrink_cfg(cfg["model"])
    in_ch = model_cfg["backbone"].get("in_channels", 3)
    dh = model_cfg["decode_head"]
    num_classes = (dh[-1] if isinstance(dh, list) else dh)["num_classes"]
    model = build_segmentor(model_cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, in_ch)
                    .astype(np.float32))
    variables = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False,
                                 with_aux=True)
        if model_cfg.get("auxiliary_head") else
        model.init({"params": r}, xx, train=False))(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, method=model.inference)
    assert out.shape == (1, 64, 64, num_classes)
    assert np.isfinite(np.asarray(out)).all()


def test_losses_extra():
    from peanut_tpu.models.losses_extra import FocalLoss, LovaszLoss

    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    target = jnp.asarray(rng.randint(0, 4, (2, 8, 8)))
    fl = FocalLoss()(pred, target)
    assert np.isfinite(float(fl)) and float(fl) > 0
    ll = LovaszLoss()(pred, target)
    assert np.isfinite(float(ll)) and 0 <= float(ll) <= 1.0

    # perfect prediction -> lovasz ~ 0
    perfect = jax.nn.one_hot(target, 4) * 100.0
    assert float(LovaszLoss()(perfect, target)) < 1e-3
