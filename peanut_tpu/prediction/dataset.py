"""Semantic-map dataset + augmentation pipeline for prediction training.

Twin of the reference's SemMapDataset + LoadMapFromFile + mmcv transforms
(/root/reference/prediction/train_prediction_model.py:31-170 and
nav/pred_model_cfg.py:47-56): each saved episode .npz holds a
(20, 14, H, W) uint8 sequence of map snapshots at steps 25..500; the first
10 timesteps become partial-map inputs and the supervision target is the
**final** map's 6 goal-category channels masked to the regions unexplored at
the input timestep.

Augmentations mirror the reference recipe: Pad to 1.25x with zeros ->
RandomCrop to map size -> RandomFlip 0.5 -> RandomRotate +-180deg p=1.0
(bilinear for the input stack, the target channels ride along the same
transform; mmcv rotates with cv2.warpAffine).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..registry import DATASETS

NUM_TARGET_CATEGORIES = 6
GOAL_CHANNELS = slice(4, 4 + NUM_TARGET_CATEGORIES)
NUM_INPUT_TIMESTEPS = 10


def load_map_sample(path: str, t_idx: int, maps=None) -> Dict[str, np.ndarray]:
    """LoadMapFromFile semantics (train_prediction_model.py:47-91)."""
    if maps is None:
        maps = np.load(path)
        if path.endswith("z"):
            maps = maps["maps"]
    from . import native
    nat = native.extract_timestep(maps, t_idx) if native.available() else None
    if nat is not None:
        img, gt = nat
        return {"img": img, "gt": gt}
    img = maps[t_idx].transpose(1, 2, 0).astype(np.float32) / 255.0  # HWC
    explored = img[:, :, 1] > 0
    gt = (maps[-1, GOAL_CHANNELS] * (1 - explored)).transpose(1, 2, 0)
    return {"img": img, "gt": gt.astype(np.float32)}


@DATASETS.register()
class SemMapDataset:
    """Index over (file, t_idx) pairs; 10 samples per episode file.

    A small LRU cache keeps the most recent decompressed episode arrays —
    the reference re-inflates the full 258MB npz member for every sample;
    grouped access amortises that 10x.
    """

    def __init__(self, data_root: str, img_dir: str = "train",
                 pipeline=None, decode_cache: int = 4, **unused):
        self.dir = os.path.join(data_root, img_dir)
        self.pipeline = pipeline
        files = sorted(f for f in os.listdir(self.dir)
                       if f.endswith(".npz") or f.endswith(".npy"))
        self.samples: List[Tuple[str, int]] = [
            (os.path.join(self.dir, f), t)
            for f in files for t in range(NUM_INPUT_TIMESTEPS)]
        if not self.samples:
            raise FileNotFoundError(f"no map files under {self.dir}")
        from collections import OrderedDict
        self._cache: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._cache_size = decode_cache
        import threading
        self._cache_lock = threading.Lock()

    def __len__(self):
        return len(self.samples)

    def _load_maps(self, path: str) -> np.ndarray:
        with self._cache_lock:
            if path in self._cache:
                self._cache.move_to_end(path)
                return self._cache[path]
        maps = np.load(path)
        if path.endswith("z"):
            maps = maps["maps"]
        with self._cache_lock:
            self._cache[path] = maps
            while len(self._cache) > self._cache_size:
                self._cache.popitem(last=False)
        return maps

    def __getitem__(self, i) -> Dict[str, np.ndarray]:
        path, t_idx = self.samples[i]
        sample = load_map_sample(path, t_idx, maps=self._load_maps(path))
        if self.pipeline is not None:
            sample = self.pipeline(sample)
        return sample


# ----------------------------------------------------------------------
# Augmentations (cv2-backed, mmcv-parity)
# ----------------------------------------------------------------------

class Pad:
    """Zero-pad bottom/right to a fixed size (mmcv Pad semantics)."""

    def __init__(self, size: Tuple[int, int], pad_val: float = 0.0):
        self.size = size
        self.pad_val = pad_val

    def __call__(self, s):
        for key in ("img", "gt"):
            x = s[key]
            ph = max(0, self.size[0] - x.shape[0])
            pw = max(0, self.size[1] - x.shape[1])
            s[key] = np.pad(x, ((0, ph), (0, pw), (0, 0)),
                            constant_values=self.pad_val)
        return s


class RandomCrop:
    def __init__(self, crop_size: Tuple[int, int], rng=None):
        self.crop = crop_size
        self.rng = rng or np.random

    def __call__(self, s):
        h, w = s["img"].shape[:2]
        ch, cw = self.crop
        y = self.rng.randint(0, max(h - ch, 0) + 1)
        x = self.rng.randint(0, max(w - cw, 0) + 1)
        for key in ("img", "gt"):
            s[key] = s[key][y:y + ch, x:x + cw]
        return s


class RandomFlip:
    def __init__(self, prob: float = 0.5, rng=None):
        self.prob = prob
        self.rng = rng or np.random

    def __call__(self, s):
        if self.rng.rand() < self.prob:
            for key in ("img", "gt"):
                s[key] = s[key][:, ::-1].copy()
        return s


class RandomRotate:
    """Rotate by a uniform angle in [-degree, degree] (mmcv: cv2.warpAffine,
    bilinear for img, nearest for seg targets)."""

    def __init__(self, prob: float = 1.0, degree: float = 180.0,
                 pad_val: float = 0.0, rng=None):
        self.prob = prob
        self.degree = degree
        self.pad_val = pad_val
        self.rng = rng or np.random

    def __call__(self, s):
        import cv2

        if self.rng.rand() >= self.prob:
            return s
        angle = self.rng.uniform(-self.degree, self.degree)
        h, w = s["img"].shape[:2]
        m = cv2.getRotationMatrix2D(((w - 1) * 0.5, (h - 1) * 0.5), angle, 1.0)
        s["img"] = cv2.warpAffine(s["img"], m, (w, h),
                                  flags=cv2.INTER_LINEAR,
                                  borderValue=self.pad_val).reshape(h, w, -1)
        s["gt"] = cv2.warpAffine(s["gt"], m, (w, h),
                                 flags=cv2.INTER_NEAREST,
                                 borderValue=self.pad_val).reshape(h, w, -1)
        return s


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, s):
        for t in self.transforms:
            s = t(s)
        return s


class FusedAugment:
    """Native (C++/OpenMP) fusion of Pad -> RandomCrop -> RandomFlip ->
    RandomRotate into one inverse-mapped resampling pass.  Draws random
    numbers in exactly the same order as the python chain so seeded runs
    agree; returns None-equivalent fallback handled by training_pipeline."""

    def __init__(self, map_size: int, rng=None):
        self.map_size = map_size
        self.pad = int(map_size * 1.25)
        self.rng = rng or np.random

    def __call__(self, s):
        from . import native

        h, w = s["img"].shape[:2]
        ph, pw = max(self.pad, h), max(self.pad, w)
        crop_y = self.rng.randint(0, max(ph - self.map_size, 0) + 1)
        crop_x = self.rng.randint(0, max(pw - self.map_size, 0) + 1)
        flip = self.rng.rand() < 0.5
        do_rot = self.rng.rand() < 1.0  # prob=1.0 in the recipe
        angle = self.rng.uniform(-180.0, 180.0) if do_rot else 0.0
        out = native.augment_sample(s["img"], s["gt"], self.map_size,
                                    crop_y, crop_x, flip, angle)
        if out is None:
            raise RuntimeError("native pipeline unavailable")
        s["img"], s["gt"] = out
        return s


def training_pipeline(map_size: int = 960, rng=None,
                      use_native: bool = True) -> Compose:
    """The reference training recipe (pred_model_cfg.py:47-56)."""
    from . import native

    if use_native and native.available():
        return Compose([FusedAugment(map_size, rng=rng)])
    return Compose([
        Pad((int(map_size * 1.25), int(map_size * 1.25))),
        RandomCrop((map_size, map_size), rng=rng),
        RandomFlip(0.5, rng=rng),
        RandomRotate(1.0, 180.0, rng=rng),
    ])


# ----------------------------------------------------------------------
# Batching with background prefetch
# ----------------------------------------------------------------------

class PrefetchLoader:
    """Shuffling, epoch-looping batch iterator with a worker thread pool.

    Replaces torch DataLoader (mmseg datasets/builder.py:90-175): worker
    threads decode + augment .npz samples while the device trains, a bounded
    queue provides backpressure (double buffering host->HBM).

    Multi-host sharding (``num_shards``/``shard_id``) replicates the
    reference's DistributedSampler (mmseg samplers/distributed_sampler.py:
    13-48): every shard draws the SAME synced-seed permutation per epoch,
    pads it by wraparound to a multiple of the shard count, and takes the
    rank-strided slice ``order[shard_id::num_shards]`` — so shards see
    disjoint sample streams whose union per epoch is the whole dataset.
    ``batch_size`` is the PER-SHARD batch (reference samples_per_gpu).
    """

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 num_workers: int = 4, queue_depth: int = 4,
                 num_shards: int = 1, shard_id: int = 0):
        if not (0 <= shard_id < num_shards):
            raise ValueError(f"shard_id {shard_id} not in [0, {num_shards})")
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.num_workers = num_workers
        self.queue_depth = queue_depth
        self.num_shards = num_shards
        self.shard_id = shard_id

    def _epoch_order(self, rng) -> np.ndarray:
        order = rng.permutation(len(self.dataset))
        if self.num_shards > 1:
            total = -(-len(order) // self.num_shards) * self.num_shards
            if total > len(order):       # wraparound pad (reference :33-35)
                order = np.concatenate([order, order[:total - len(order)]])
            order = order[self.shard_id::self.num_shards]
        return order

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        import queue as queue_mod
        import threading

        rng = np.random.RandomState(self.seed)
        out_q: "queue_mod.Queue" = queue_mod.Queue(self.queue_depth)
        idx_q: "queue_mod.Queue" = queue_mod.Queue()
        stop = threading.Event()

        def producer():
            epoch = 0
            while not stop.is_set():
                order = self._epoch_order(rng)
                for start in range(0, len(order) - self.batch_size + 1,
                                   self.batch_size):
                    idx_q.put(order[start:start + self.batch_size])
                epoch += 1

        def worker():
            while not stop.is_set():
                try:
                    idxs = idx_q.get(timeout=0.5)
                except queue_mod.Empty:
                    continue
                samples = [self.dataset[i] for i in idxs]
                batch = {k: np.stack([s[k] for s in samples])
                         for k in samples[0]}
                out_q.put(batch)

        threads = [threading.Thread(target=producer, daemon=True)]
        threads += [threading.Thread(target=worker, daemon=True)
                    for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            while True:
                yield out_q.get()
        finally:
            stop.set()


class GlobalShardedLoader:
    """Assemble per-process local batches into globally-sharded jax.Arrays.

    The multi-host half of the DistributedSampler replacement: each process
    iterates its OWN rank-strided ``PrefetchLoader`` and contributes its
    local numpy batch; ``jax.make_array_from_process_local_data`` stitches
    the shards into one global array laid out by ``shardings`` (the
    train step's batch sharding, e.g. batch axis over mesh 'data').  The
    global batch therefore equals process-count x per-process batch, with
    process p owning rows [p*local_bs, (p+1)*local_bs) — no host ever
    materializes another host's samples.  Single-process meshes degrade to
    a committed device_put (identical values, one fewer copy at dispatch).

    Reference analog: mmseg datasets/builder.py:90-175 building per-rank
    DataLoaders whose outputs MMDistributedDataParallel consumes rank-local.
    """

    def __init__(self, loader, shardings: Dict):
        self.loader = loader
        self.shardings = shardings

    def __iter__(self):
        import jax

        for batch in self.loader:
            yield {k: jax.make_array_from_process_local_data(
                self.shardings[k], np.ascontiguousarray(v))
                for k, v in batch.items()}
