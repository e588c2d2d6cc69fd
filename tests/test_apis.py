"""High-level apis facade + class names + logger hooks."""

import numpy as np
import pytest

from peanut_tpu import apis
from peanut_tpu.prediction.class_names import get_classes
from peanut_tpu.utils.loggers import (TextLoggerHook, WandbLoggerHook,
                                      CompositeLogger, read_train_log)

from test_models import small_pspnet_config


@pytest.mark.slow
def test_init_and_inference_segmentor():
    bundle = apis.init_segmentor({"model": small_pspnet_config(16)},
                                 input_size=32)
    img = np.random.RandomState(0).rand(14, 48, 48).astype(np.float32)  # CHW
    probs = apis.inference_segmentor(bundle, img)
    assert probs.shape == (6, 48, 48)
    assert (probs >= 0).all() and (probs <= 1).all()
    logits = apis.inference_segmentor(bundle, img, logits=True)
    assert np.abs(logits).max() > 1.0 or logits.min() < 0


def test_init_segmentor_from_pth(tmp_path):
    from peanut_tpu.core.checkpoint import export_encoder_decoder_to_torch
    from peanut_tpu.models import build_segmentor, init_segmentor_params

    model = build_segmentor(small_pspnet_config(16))
    variables = init_segmentor_params(model, (1, 32, 32, 14))
    path = str(tmp_path / "w.pth")
    export_encoder_decoder_to_torch(variables, path)
    bundle = apis.init_segmentor({"model": small_pspnet_config(16)},
                                 checkpoint=path)
    img = np.random.RandomState(1).rand(32, 32, 14).astype(np.float32)
    a = apis.inference_segmentor(bundle, img)
    b = apis.inference_segmentor(
        apis.SegmentorBundle(model, variables, {}), img)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_class_names():
    assert len(get_classes("cityscapes")) == 19
    assert len(get_classes("ade20k")) == 150
    assert get_classes("hm3d") == ["chair", "bed", "plant", "toilet",
                                   "tv_monitor", "sofa"]
    assert len(get_classes("peanut")) == 9
    with pytest.raises(KeyError):
        get_classes("nope")


def test_logger_hooks(tmp_path, caplog):
    import logging

    caplog.set_level(logging.INFO, logger="peanut_tpu")
    hooks = CompositeLogger([TextLoggerHook(), WandbLoggerHook()])
    hooks.log({"iter": 10, "loss": 0.51234})
    assert any("Iter [10]" in r.message for r in caplog.records)

    p = tmp_path / "log.jsonl"
    p.write_text('{"iter": 1, "loss": 0.5}\n{"iter": 2, "loss": 0.4}\n')
    recs = read_train_log(str(p))
    assert [r["iter"] for r in recs] == [1, 2]
