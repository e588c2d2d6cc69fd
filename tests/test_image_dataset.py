"""Tests for the image-folder datasets (CustomDataset parity) and the
analysis tool CLIs (print_config / analyze_logs / confusion_matrix)."""

import json
import os

import numpy as np
import pytest

from peanut_tpu.registry import DATASETS
import peanut_tpu.prediction  # noqa: F401  (registers datasets)


@pytest.fixture
def pseudo_dataset(tmp_path):
    """The reference's tests/data/pseudo_dataset pattern: tiny image/label
    pairs on disk."""
    cv2 = pytest.importorskip("cv2")
    img_dir = tmp_path / "img_dir"
    ann_dir = tmp_path / "ann_dir"
    img_dir.mkdir()
    ann_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        gt = rng.randint(0, 4, (16, 16)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"s{i}.jpg"), img)
        cv2.imwrite(str(ann_dir / f"s{i}.png"), gt)
    return str(tmp_path)


def test_custom_dataset(pseudo_dataset):
    ds = DATASETS.get("CustomDataset")(
        data_root=pseudo_dataset, classes=["a", "b", "c", "d"])
    assert len(ds) == 3
    s = ds[0]
    assert s["img"].shape == (16, 16, 3) and s["gt"].shape == (16, 16)

    # pre_eval -> evaluate: perfect predictions give mIoU == 1
    preds = [ds.get_gt_seg_map(i) for i in range(3)]
    results = ds.pre_eval(preds, list(range(3)))
    metrics = ds.evaluate(results, metric=["mIoU", "mDice"])
    assert abs(float(np.nanmean(metrics["IoU"])) - 1.0) < 1e-6
    assert abs(float(np.nanmean(metrics["Dice"])) - 1.0) < 1e-6
    assert abs(float(metrics["aAcc"]) - 1.0) < 1e-6


def test_named_datasets_registered():
    for name in ("CityscapesDataset", "ADE20KDataset", "PascalVOCDataset",
                 "CustomDataset", "SemMapDataset"):
        assert name in DATASETS


def test_reduce_zero_label(pseudo_dataset):
    ds = DATASETS.get("ADE20KDataset")(data_root=pseudo_dataset,
                                       img_suffix=".jpg")
    gt = ds.get_gt_seg_map(0)
    # label 0 must have been remapped to ignore (255)
    raw = DATASETS.get("CustomDataset")(
        data_root=pseudo_dataset).get_gt_seg_map(0)
    assert ((gt == 255) == (raw == 0)).all()
    assert (gt[raw > 0] == raw[raw > 0] - 1).all()


def test_tools_print_config_and_analyze_logs(tmp_path, capsys):
    from peanut_tpu.cli.tools import main

    main(["print_config", "configs/unet/fcn_unet.py"])
    out = capsys.readouterr().out
    assert "EncoderDecoder" in out and "UNet" in out

    log = tmp_path / "log.jsonl"
    with open(log, "w") as f:
        for i in range(5):
            f.write(json.dumps({"iter": i, "loss": 1.0 / (i + 1),
                                "lr": 5e-4}) + "\n")
    main(["analyze_logs", str(log), "--curve"])
    out = capsys.readouterr().out
    assert "loss" in out and "last=0.2" in out


def test_tools_confusion_matrix(pseudo_dataset, tmp_path, capsys):
    from peanut_tpu.cli.tools import main

    out_npy = str(tmp_path / "cm.npy")
    main(["confusion_matrix", "configs/unet/fcn_unet.py", "",
          pseudo_dataset, "--max_samples", "1", "--out", out_npy])
    printed = capsys.readouterr().out
    assert "overall_acc" in printed
    cm = np.load(out_npy)
    # k falls back to the model's 2 classes; gt pixels outside [0,k) are
    # excluded from the matrix
    assert cm.shape[0] == cm.shape[1] and 0 < cm.sum() <= 16 * 16


def test_bundled_dataset_zoo_registered():
    """Round-3: the full bundled dataset zoo from the reference's
    mmseg/datasets/ directory binds onto ImageSegDataset."""
    for name in ("ChaseDB1Dataset", "DRIVEDataset", "HRFDataset",
                 "STAREDataset", "PascalContextDataset",
                 "PascalContextDataset59", "COCOStuffDataset",
                 "LoveDADataset", "PotsdamDataset", "ISPRSDataset",
                 "iSAIDDataset", "DarkZurichDataset",
                 "NightDrivingDataset"):
        assert name in DATASETS
    assert len(DATASETS.get("PascalContextDataset").CLASSES) == 60
    assert len(DATASETS.get("PascalContextDataset59").CLASSES) == 59
    assert len(DATASETS.get("COCOStuffDataset").CLASSES) == 171
    assert len(DATASETS.get("iSAIDDataset").CLASSES) == 16
    assert (DATASETS.get("PotsdamDataset").CLASSES
            == DATASETS.get("ISPRSDataset").CLASSES)


def _make_pairs(tmp_path, img_suffix, seg_suffix, seg_stem=lambda s: s,
                n=2):
    import cv2
    img_dir = tmp_path / "img_dir"
    ann_dir = tmp_path / "ann_dir"
    img_dir.mkdir(exist_ok=True)
    ann_dir.mkdir(exist_ok=True)
    rng = np.random.RandomState(1)
    for i in range(n):
        stem = f"t{i}"
        cv2.imwrite(str(img_dir / (stem + img_suffix)),
                    (rng.rand(8, 8, 3) * 255).astype(np.uint8))
        cv2.imwrite(str(ann_dir / (seg_stem(stem) + seg_suffix)),
                    rng.randint(0, 2, (8, 8)).astype(np.uint8))
    return str(tmp_path)


def test_vessel_dataset_suffix_pairing(tmp_path):
    pytest.importorskip("cv2")
    root = _make_pairs(tmp_path, ".png", "_1stHO.png")
    ds = DATASETS.get("ChaseDB1Dataset")(data_root=root)
    assert len(ds) == 2
    s = ds[0]
    assert s["gt"].shape == (8, 8) and ds.num_classes == 2


def test_isaid_annotation_stem(tmp_path):
    pytest.importorskip("cv2")
    root = _make_pairs(tmp_path, ".png", ".png",
                       seg_stem=lambda s: s + "_instance_color_RGB")
    ds = DATASETS.get("iSAIDDataset")(data_root=root)
    assert len(ds) == 2
    assert ds[1]["gt"].shape == (8, 8)


def test_format_results_cityscapes_and_loveda(tmp_path):
    cv2 = pytest.importorskip("cv2")
    root = _make_pairs(tmp_path, "_leftImg8bit.png",
                       "_gtFine_labelTrainIds.png")
    ds = DATASETS.get("CityscapesDataset")(data_root=root)
    pred = np.zeros((8, 8), np.uint8)
    pred[0, 0] = 18  # bicycle trainId -> labelId 33
    files = ds.format_results([pred], str(tmp_path / "fmt"), indices=[0])
    out = cv2.imread(files[0], cv2.IMREAD_GRAYSCALE)
    assert out[0, 0] == 33 and out[1, 1] == 7  # road trainId 0 -> 7

    (tmp_path / "ld").mkdir()
    root2 = _make_pairs(tmp_path / "ld", ".png", ".png")
    lds = DATASETS.get("LoveDADataset")(data_root=root2)
    files = lds.format_results([pred], str(tmp_path / "fmt2"), indices=[0])
    out = cv2.imread(files[0], cv2.IMREAD_GRAYSCALE)
    assert out[0, 0] == 18  # raw ids, no remap
