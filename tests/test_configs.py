"""Config-file system tests + the reference's config-sweep pattern
(tests/test_config.py: build a model from every file under configs/)."""

import glob
import os

import numpy as np
import pytest

from peanut_tpu.core.config_file import load_config, merge_dict
from peanut_tpu.models import build_segmentor
from peanut_tpu.registry import Registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_merge_semantics():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    over = {"a": {"y": 5}, "c": 7}
    m = merge_dict(base, over)
    assert m == {"a": {"x": 1, "y": 5}, "b": 3, "c": 7}


def test_delete_key_replaces():
    base = {"m": {"head": {"type": "PSPHead", "channels": 512}}}
    over = {"m": {"head": {"_delete_": True, "type": "FCNHead"}}}
    m = merge_dict(base, over)
    assert m["m"]["head"] == {"type": "FCNHead"}


def test_base_inheritance(tmp_path):
    (tmp_path / "base.py").write_text("x = 1\nd = dict(a=1, b=2)\n")
    (tmp_path / "child.py").write_text(
        "_base_ = 'base.py'\nd = dict(b=3)\ny = 2\n")
    cfg = load_config(str(tmp_path / "child.py"))
    assert cfg == {"x": 1, "d": {"a": 1, "b": 3}, "y": 2}


def test_peanut_prediction_config_matches_builtin():
    cfg = load_config(os.path.join(REPO, "configs/pspnet/peanut_prediction.py"))
    m = cfg["model"]
    assert m["backbone"]["in_channels"] == 14
    assert m["decode_head"]["num_classes"] == 6
    assert m["decode_head"]["loss_decode"]["type"] == "MultiLabelBCELoss"
    assert m["auxiliary_head"]["loss_decode"]["loss_weight"] == 0.4
    assert cfg["optimizer"] == {"type": "Adam", "lr": 0.0005}
    assert cfg["runner"]["max_iters"] == 60000


@pytest.mark.parametrize("path", sorted(
    p for p in glob.glob(os.path.join(REPO, "configs/*/*.py"))
    if "_base_" not in p and os.sep + "habitat" + os.sep not in p))
def test_every_config_builds(path):
    """Sweep: every zoo config (including the generated dataset x
    schedule variants, scripts/generate_config_zoo.py) must construct a
    model object and resolve its _base_ chain."""
    cfg = load_config(path)
    model = build_segmentor(cfg["model"])
    assert model is not None


def test_registry_fake_component_pattern():
    """The reference's testability pattern: register a fake component and
    build it from a dict config (mmseg tests/test_segmentors/utils.py)."""
    reg = Registry("test")

    @reg.register()
    class FakeBackbone:
        def __init__(self, width=1):
            self.width = width

    obj = reg.build({"type": "FakeBackbone", "width": 7})
    assert obj.width == 7
    with pytest.raises(KeyError):
        reg.build({"type": "Missing"})


REF_FIX = os.path.join(REPO, "tests/fixtures/ref_configs")
_ref_cfgs = sorted(p for p in glob.glob(os.path.join(REF_FIX, "*/*.py"))
                   if "_base_" not in p)


@pytest.mark.parametrize("path", _ref_cfgs,
                         ids=[os.path.basename(p) for p in _ref_cfgs])
def test_reference_config_builds(path):
    """Every VERBATIM upstream config fixture (see fixtures README) must
    load through the _base_/_delete_ resolver and build its model —
    proving mmcv Config.fromfile compatibility on unmodified files
    (reference loader: prediction/train_prediction_model.py:216)."""
    cfg = load_config(path)
    assert "model" in cfg and "data" in cfg
    # schedule/runtime keys from the _base_ chain must survive the merge
    assert "optimizer" in cfg and "runner" in cfg
    model = build_segmentor(cfg["model"])
    assert model is not None
