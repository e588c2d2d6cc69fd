"""Generic image/annotation-folder segmentation datasets.

The reference's CustomDataset (prediction/mmseg/datasets/custom.py:19) is
the base of its 20+ bundled dataset classes: samples are (image, label-map)
file pairs discovered by suffix under ``img_dir``/``ann_dir``, with
``pre_eval`` computing per-sample IoU histograms and ``evaluate`` reducing
to mIoU/mDice/mFscore.  ``ImageSegDataset`` reproduces that contract;
the named subclasses bind the standard vocabularies/suffix conventions
(cityscapes.py, ade.py, voc.py, coco_stuff.py).

Images load host-side (cv2) — on the TPU stack the dataset is pure host IO
feeding the jitted train step, so no torch DataLoader analog is needed
beyond the threaded PrefetchLoader in dataset.py.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from ..registry import DATASETS
from .class_names import get_classes
from .metrics import intersect_and_union, pre_eval_to_metrics


class ImageSegDataset:
    """CustomDataset-equivalent over parallel image/annotation folders."""

    CLASSES: Optional[Sequence[str]] = None
    PALETTE = None

    def __init__(self, data_root: str, img_dir: str = "img_dir",
                 ann_dir: str = "ann_dir", img_suffix: str = ".jpg",
                 seg_map_suffix: str = ".png", split: Optional[str] = None,
                 pipeline=None, reduce_zero_label: bool = False,
                 ignore_index: int = 255, classes=None, **unused):
        self.img_dir = os.path.join(data_root, img_dir)
        self.ann_dir = os.path.join(data_root, ann_dir) if ann_dir else None
        self.img_suffix = img_suffix
        self.seg_map_suffix = seg_map_suffix
        self.pipeline = pipeline
        self.reduce_zero_label = reduce_zero_label
        self.ignore_index = ignore_index
        if classes is not None:
            self.CLASSES = list(classes)
        if split:
            with open(os.path.join(data_root, split)) as f:
                stems = [ln.strip() for ln in f if ln.strip()]
        else:
            stems = sorted(
                fn[:-len(img_suffix)]
                for fn in os.listdir(self.img_dir)
                if fn.endswith(img_suffix))
        if not stems:
            raise FileNotFoundError(f"no {img_suffix} files in "
                                    f"{self.img_dir}")
        self.stems: List[str] = stems

    def __len__(self):
        return len(self.stems)

    @property
    def num_classes(self):
        return len(self.CLASSES) if self.CLASSES else 0

    def _imread(self, path, gray=False):
        import cv2
        flag = cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR
        img = cv2.imread(path, flag)
        if img is None:
            raise FileNotFoundError(path)
        if not gray:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return img

    def get_gt_seg_map(self, idx: int) -> np.ndarray:
        gt = self._imread(os.path.join(
            self.ann_dir, self.stems[idx] + self.seg_map_suffix), gray=True)
        gt = gt.astype(np.int64)
        if self.reduce_zero_label:  # custom.py semantics: 0 -> ignore
            gt[gt == 0] = self.ignore_index + 1
            gt = gt - 1
            gt[gt == self.ignore_index] = self.ignore_index
        return gt

    def __getitem__(self, idx: int):
        img = self._imread(os.path.join(
            self.img_dir, self.stems[idx] + self.img_suffix))
        sample = {"img": img.astype(np.float32),
                  "gt": self.get_gt_seg_map(idx) if self.ann_dir else None}
        if self.pipeline is not None:
            sample = self.pipeline(sample)
        return sample

    # -- evaluation protocol (custom.py pre_eval:277 / evaluate:388) --------

    def pre_eval(self, preds, indices):
        if not isinstance(indices, (list, tuple)):
            indices = [indices]
        if not isinstance(preds, (list, tuple)):
            preds = [preds]
        return [intersect_and_union(
            np.asarray(p), self.get_gt_seg_map(i), self.num_classes,
            ignore_index=self.ignore_index)
            for p, i in zip(preds, indices)]

    def evaluate(self, results, metric="mIoU", **kw):
        metrics = metric if isinstance(metric, (list, tuple)) else [metric]
        return pre_eval_to_metrics(results, metrics=metrics)


@DATASETS.register()
class CityscapesDataset(ImageSegDataset):
    CLASSES = tuple(get_classes("cityscapes"))

    def __init__(self, **kw):
        kw.setdefault("img_suffix", "_leftImg8bit.png")
        kw.setdefault("seg_map_suffix", "_gtFine_labelTrainIds.png")
        super().__init__(**kw)


@DATASETS.register()
class ADE20KDataset(ImageSegDataset):
    CLASSES = tuple(get_classes("ade20k"))

    def __init__(self, **kw):
        kw.setdefault("img_suffix", ".jpg")
        kw.setdefault("seg_map_suffix", ".png")
        kw.setdefault("reduce_zero_label", True)
        super().__init__(**kw)


@DATASETS.register()
class PascalVOCDataset(ImageSegDataset):
    CLASSES = tuple(get_classes("voc"))

    def __init__(self, **kw):
        kw.setdefault("img_suffix", ".jpg")
        kw.setdefault("seg_map_suffix", ".png")
        super().__init__(**kw)


@DATASETS.register(name="CustomDataset")
class CustomDataset(ImageSegDataset):
    """Registered under the reference's base name for config parity.
    (Concat/Repeat wrappers + OHEM sampler live in wrappers.py.)"""
