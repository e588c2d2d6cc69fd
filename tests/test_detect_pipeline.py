"""Chunked-detect pipeline (stage_obs -> _launch_detect -> _pack_obs).

The batched runtime launches a detect chunk as soon as ``segmenter.chunk``
envs have staged their frames (overlapping detection with straggler env
stepping); _pack_obs flushes the partial tail and consumes the per-obs
``_sem_dev`` slices.  This must be a pure scheduling change: actions and
maps are identical to the unchunked path (one batch_device call over all
envs).  Reference behavior point: one env per process at
nav/collect.py:44-84 — chunking has no reference twin, so equality with
the unchunked path is the spec.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peanut_tpu.envs import FakeNavEnv
from peanut_tpu.envs.batch_runner import BatchRunner

from test_agent_e2e import small_cfg, tiny_prediction_model


class FakeDeviceSegmenter:
    """batch_device contract twin: (B, eh, ew, 3) u8 -> (B, nsc, fh, fw)."""

    def __init__(self, cfg, chunk):
        self.cfg = cfg
        self.chunk = chunk
        self.call_sizes = []

    def batch_device(self, rgbs_u8, goal_cats):
        self.call_sizes.append(int(rgbs_u8.shape[0]))
        cfg = self.cfg
        ds = cfg.env_frame_width // cfg.frame_width
        r = jnp.asarray(rgbs_u8).astype(jnp.float32)
        if ds != 1:
            r = r[:, ds // 2::ds, ds // 2::ds]
        base = (r.mean(axis=-1) > 100.0).astype(jnp.float32)  # (B, fh, fw)
        onehot = jax.nn.one_hot(jnp.asarray(np.asarray(goal_cats, np.int32)),
                                cfg.num_sem_categories)
        return base[:, None] * onehot[:, :, None, None]


def run(chunk, seeds, steps=12):
    cfg = small_cfg(use_gt_seg=0)
    pm = tiny_prediction_model(cfg)
    seg = FakeDeviceSegmenter(cfg, chunk)
    runner = BatchRunner(
        cfg, [lambda s=s: FakeNavEnv(cfg, size_m=12.0, seed=s,
                                     max_steps=steps + 5) for s in seeds],
        prediction_model=pm, segmenter=seg)
    runner.reset_all()
    for _ in range(steps):
        runner.tick()
    # the maps integrate every tick's semantics + actions, so bit-equal
    # maps after N ticks imply the whole rollout matched
    local = np.asarray(runner.runtime.state.local_maps)
    return seg, local, [s.step for s in runner.runtime.slots]


@pytest.mark.slow
def test_chunked_detect_matches_unchunked():
    seeds = [2, 9, 17, 23]
    seg_c, maps_c, steps_c = run(chunk=2, seeds=seeds)
    seg_u, maps_u, steps_u = run(chunk=0, seeds=seeds)

    # unchunked: one batch_device call per tick over all envs
    assert set(seg_u.call_sizes) == {len(seeds)}
    # chunked: reset_all() does not stage frames, so the FIRST tick packs
    # one full-size call; every later call is chunk-sized (the tail flush
    # in _pack_obs may be smaller)
    assert seg_c.call_sizes[0] == len(seeds)
    assert max(seg_c.call_sizes[1:]) <= 2
    # the pipelined path detects frames as they are staged, so the LAST
    # tick's staged frames are detected speculatively and never consumed
    # (the rollout ends before the next _pack_obs) — one extra tick's
    # worth of frames vs the unchunked path, which detects on demand
    assert sum(seg_c.call_sizes) == sum(seg_u.call_sizes) + len(seeds)

    assert steps_c == steps_u
    np.testing.assert_array_equal(maps_c, maps_u)
