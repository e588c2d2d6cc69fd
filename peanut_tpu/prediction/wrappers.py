"""Dataset wrappers + pixel samplers (mmseg parity: dataset_wrappers.py,
core/seg/sampler/ohem_pixel_sampler.py)."""

from __future__ import annotations

import bisect
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..registry import DATASETS


@DATASETS.register()
class ConcatDataset:
    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self.cum = np.cumsum([len(d) for d in self.datasets]).tolist()

    def __len__(self):
        return self.cum[-1]

    def __getitem__(self, i):
        d = bisect.bisect_right(self.cum, i)
        prev = self.cum[d - 1] if d > 0 else 0
        return self.datasets[d][i - prev]


@DATASETS.register()
class RepeatDataset:
    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times

    def __len__(self):
        return len(self.dataset) * self.times

    def __getitem__(self, i):
        return self.dataset[i % len(self.dataset)]


@DATASETS.register()
class MultiImageMixDataset:
    """Mixed-image augmentation wrapper (dataset_wrappers.py:196): any
    pipeline stage exposing ``get_indexes(dataset)`` (e.g. RandomMosaic)
    gets ``mix_results`` — extra samples drawn from the base dataset —
    injected into the sample before it runs, and stripped after."""

    def __init__(self, dataset, pipeline: Sequence, skip_types=None):
        self.dataset = dataset
        self.pipeline = list(pipeline)
        self.skip_types = set(skip_types or ())
        self.CLASSES = getattr(dataset, "CLASSES", None)

    def __len__(self):
        return len(self.dataset)

    def update_skip_type_keys(self, skip_types):
        self.skip_types = set(skip_types)

    def __getitem__(self, i):
        import copy
        s = copy.deepcopy(self.dataset[i])
        for t in self.pipeline:
            if type(t).__name__ in self.skip_types:
                continue
            if hasattr(t, "get_indexes"):
                idxs = t.get_indexes(self.dataset)
                if not isinstance(idxs, (list, tuple)):
                    idxs = [idxs]
                s["mix_results"] = [copy.deepcopy(self.dataset[j])
                                    for j in idxs]
            s = t(s)
            s.pop("mix_results", None)
        return s


def ohem_pixel_weights(logits, target, thresh: float = 0.7,
                       min_kept: int = 100_000, ignore_index: int = 255):
    """Online Hard Example Mining pixel weights (OHEMPixelSampler parity).

    logits: (B, H, W, C); target: (B, H, W) int.  Returns a (B, H, W) 0/1
    weight map selecting hard pixels: those whose GT-class probability is
    below ``thresh``, but always at least ``min_kept`` per batch element
    (by lowest probability).  Static-shape formulation: selection is a mask,
    not a gather.
    """
    probs = jax.nn.softmax(logits, axis=-1)
    valid = target != ignore_index
    safe_t = jnp.where(valid, target, 0)
    gt_prob = jnp.take_along_axis(probs, safe_t[..., None], axis=-1)[..., 0]
    gt_prob = jnp.where(valid, gt_prob, jnp.inf)

    b = logits.shape[0]
    flat = gt_prob.reshape(b, -1)
    k = min(min_kept, flat.shape[1])
    kth = jnp.sort(flat, axis=1)[:, k - 1]            # per-image kth prob
    cutoff = jnp.maximum(kth, thresh)
    keep = (gt_prob <= cutoff[:, None, None]) & valid
    return keep.astype(logits.dtype)
