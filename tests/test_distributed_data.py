"""Multi-host training/eval data plumbing, tested without a cluster
(VERDICT r3 items 1-2; the reference's own pattern for this is
prediction/tests/test_utils/test_util_distribution.py — mock the process
group, assert the per-rank behavior).

Covers:
  * PrefetchLoader rank-strided sharding (DistributedSampler parity,
    reference mmseg/datasets/samplers/distributed_sampler.py:13-48):
    synced-seed permutation, wraparound padding, disjoint per-rank
    streams whose union per global step equals the single-process batch;
  * GlobalShardedLoader: local numpy batches -> globally-sharded
    jax.Arrays on the 8-device CPU mesh, value-transparent;
  * gather_strided_results: per-sample result collection back into
    dataset order (collect_results_cpu analog, reference
    mmseg/apis/test.py:176-233) with injected world/allgather — reduced
    metrics bit-equal to the single-process pass.
"""

from __future__ import annotations

import numpy as np
import pytest

from peanut_tpu.prediction.dataset import PrefetchLoader, GlobalShardedLoader
from peanut_tpu.prediction.metrics import gather_strided_results


class IdDataset:
    """Each sample is just its own index (traceable through batches)."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"img": np.full((2, 2), i, np.float32),
                "idx": np.asarray(i, np.int64)}


def take_batches(loader, k):
    it = iter(loader)
    return [next(it) for _ in range(k)]


def test_shard_streams_disjoint_and_complete():
    """Two simulated processes: same synced seed, rank-strided disjoint
    sample streams, union per epoch = the whole dataset."""
    n, world, local_bs = 24, 2, 4
    loaders = [PrefetchLoader(IdDataset(n), local_bs, seed=7, num_workers=1,
                              num_shards=world, shard_id=r)
               for r in range(world)]
    per_rank_epoch = n // world
    steps = per_rank_epoch // local_bs
    streams = [np.concatenate([b["idx"] for b in take_batches(ld, steps)])
               for ld in loaders]

    # exact DistributedSampler layout: shared permutation, stride world
    perm = np.random.RandomState(7).permutation(n)
    for r in range(world):
        np.testing.assert_array_equal(streams[r], perm[r::world])
    # disjoint + complete
    assert not set(streams[0].tolist()) & set(streams[1].tolist())
    assert set(np.concatenate(streams).tolist()) == set(range(n))


def test_global_batch_equals_single_process_batch():
    """Per-global-step: the assembled global batch (rank-order concat of
    the shard batches, the layout make_array_from_process_local_data
    produces) equals the single-process loader's batch as a multiset."""
    n, world, global_bs = 32, 2, 8
    local_bs = global_bs // world
    single = PrefetchLoader(IdDataset(n), global_bs, seed=3, num_workers=1)
    shards = [PrefetchLoader(IdDataset(n), local_bs, seed=3, num_workers=1,
                             num_shards=world, shard_id=r)
              for r in range(world)]
    steps = n // global_bs
    single_batches = take_batches(single, steps)
    shard_batches = [take_batches(s, steps) for s in shards]
    for g in range(steps):
        assembled = np.concatenate([shard_batches[r][g]["idx"]
                                    for r in range(world)])
        want = single_batches[g]["idx"]
        assert sorted(assembled.tolist()) == sorted(want.tolist()), g


def test_shard_wraparound_padding():
    """n not divisible by world: the epoch pads by wraparound (reference
    distributed_sampler.py:33-35) so every rank sees the same count."""
    n, world = 10, 4
    loaders = [PrefetchLoader(IdDataset(n), 1, seed=0, num_workers=1,
                              num_shards=world, shard_id=r)
               for r in range(world)]
    rng_order = np.random.RandomState(0).permutation(n)
    padded = np.concatenate([rng_order, rng_order[:2]])
    for r, ld in enumerate(loaders):
        got = np.concatenate(
            [b["idx"] for b in take_batches(ld, 3)])
        np.testing.assert_array_equal(got, padded[r::world])


def test_global_sharded_loader_values_and_sharding():
    """On the 8-device CPU mesh the wrapper must yield value-identical
    global arrays laid out over the 'data' axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from peanut_tpu.core.mesh import make_mesh

    mesh = make_mesh({"data": len(jax.devices())})
    sh = {"img": NamedSharding(mesh, P("data")),
          "idx": NamedSharding(mesh, P("data"))}
    loader = PrefetchLoader(IdDataset(64), 8, seed=1, num_workers=1)
    plain = take_batches(loader, 2)
    wrapped = take_batches(GlobalShardedLoader(
        PrefetchLoader(IdDataset(64), 8, seed=1, num_workers=1), sh), 2)
    for pb, wb in zip(plain, wrapped):
        for k in pb:
            assert isinstance(wb[k], jax.Array)
            np.testing.assert_array_equal(np.asarray(wb[k]), pb[k])
        assert wb["img"].sharding.spec == P("data")


def _fake_allgather_factory(rank_locals):
    """Builds the per-rank allgather stub: every rank contributes its
    padded local array; the stub stacks them (what process_allgather
    returns on real hosts)."""
    def fake_allgather(_padded_local):
        return np.stack(rank_locals)
    return fake_allgather


def test_gather_strided_results_restores_dataset_order():
    n, world = 11, 3
    per_sample = np.random.RandomState(5).rand(n, 4, 6)
    k_max = -(-n // world)
    rank_locals = []
    for r in range(world):
        mine = per_sample[r::world]
        padded = np.zeros((k_max,) + mine.shape[1:], mine.dtype)
        padded[:len(mine)] = mine
        rank_locals.append(padded)
    fake = _fake_allgather_factory(rank_locals)
    for r in range(world):
        got = gather_strided_results(rank_locals[r][:len(per_sample[r::world])],
                                     n, world=world, allgather=fake)
        np.testing.assert_array_equal(got, per_sample)


def test_distributed_eval_metrics_bit_equal(tmp_path):
    """End-to-end over cli.test's evaluate/reduce split: three simulated
    ranks evaluate val-set shards; the gathered + reduced metrics must be
    BIT-equal to the single-process report on the same data."""
    from peanut_tpu.cli.test import evaluate_shard, reduce_metrics

    class TinyPM:
        """Deterministic stand-in for PredictionModel.get_prediction."""

        def get_prediction(self, chw):
            rng = np.random.RandomState(int(chw.sum()) % 1000)
            return rng.rand(6, 16, 16).astype(np.float64)

    class TinyDS:
        def __len__(self):
            return 11

        def __getitem__(self, i):
            rng = np.random.RandomState(100 + i)
            return {"img": np.full((16, 16, 14), i, np.float32),
                    "gt": (rng.rand(16, 16, 6) > 0.7).astype(np.float32)
                    * 255.0}

    pm, ds = TinyPM(), TinyDS()
    n, world = 11, 3

    single = evaluate_shard(pm, ds, list(range(n)), 0.5, True)
    want = reduce_metrics(single, 0.5, True)

    shard_stats = [evaluate_shard(pm, ds, list(range(r, n, world)), 0.5,
                                  True) for r in range(world)]
    k_max = -(-n // world)

    def padded(key, r):
        arr = shard_stats[r][key]
        out = np.zeros((k_max,) + arr.shape[1:], arr.dtype)
        out[:len(arr)] = arr
        return out

    got = None
    for r in range(world):
        gathered = {
            key: gather_strided_results(
                shard_stats[r][key], n, world=world,
                allgather=_fake_allgather_factory(
                    [padded(key, q) for q in range(world)]))
            for key in single}
        got_r = reduce_metrics(gathered, 0.5, True)
        assert got_r == want, f"rank {r} report differs"
        got = got_r
    assert got == want
