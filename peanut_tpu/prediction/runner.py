"""Iteration-based training runner.

Replaces mmcv's IterBasedRunner + hook stack as used by the reference
(mmseg/apis/train.py:121-194): text logging every ``log_interval`` iters
with loss averages / lr / ETA, checkpoints every ``checkpoint_interval`` to
``work_dir/iter_N``, auto-resume from the latest checkpoint.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from ..core.checkpoint import save_checkpoint, load_checkpoint, \
    find_latest_checkpoint
from .train import TrainConfig, TrainState

logger = logging.getLogger("peanut_tpu")


class IterRunner:
    def __init__(self, step_fn, state: TrainState, loader: Iterable,
                 cfg: TrainConfig, work_dir: str,
                 auto_resume: bool = True, eval_hook=None, loggers=None):
        self.step_fn = step_fn
        self.state = state
        self.loader = loader
        self.cfg = cfg
        self.eval_hook = eval_hook  # prediction.metrics.EvalHook or None
        if loggers is None:
            from ..utils.loggers import TextLoggerHook
            loggers = [TextLoggerHook()]
        self.loggers = loggers
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self.log_path = os.path.join(work_dir, "train_log.jsonl")
        if auto_resume:
            latest = find_latest_checkpoint(work_dir)
            if latest:
                self.state, step = load_checkpoint(latest, target=self.state)
                logger.info("resumed from %s (iter %s)", latest, step)

    def run(self, max_iters: Optional[int] = None):
        cfg = self.cfg
        max_iters = max_iters or cfg.max_iters
        window: Dict[str, list] = {}
        t_start = time.time()
        t_window = time.time()
        it = int(self.state.step)
        data_iter = iter(self.loader)

        while it < max_iters:
            batch = next(data_iter)
            self.state, metrics = self.step_fn(self.state, batch)
            it += 1
            for k, v in metrics.items():
                window.setdefault(k, []).append(v)

            is_primary = jax.process_index() == 0
            if it % cfg.log_interval == 0:
                # materialize lazily: one host sync per log window
                means = {k: float(np.mean([np.asarray(x) for x in v]))
                         for k, v in window.items()}
                window.clear()
                dt = time.time() - t_window
                t_window = time.time()
                ips = cfg.log_interval / dt
                eta_s = (max_iters - it) / max(ips, 1e-9)
                rec = {"iter": it, "time_per_iter": round(1.0 / ips, 4),
                       "eta_min": round(eta_s / 60, 1), **
                       {k: round(v, 5) for k, v in means.items()}}
                if is_primary:  # rank-0-only text/JSONL output (mmcv analog)
                    for hook in self.loggers:
                        hook.log(rec)
                    with open(self.log_path, "a") as f:
                        f.write(json.dumps(rec) + "\n")

            if self.eval_hook is not None:
                res = self.eval_hook.maybe_run(it, self.state)
                if res:
                    logger.info("eval@%d: %s", it, res)
                    with open(self.log_path, "a") as f:
                        f.write(json.dumps({"iter": it, "eval": res}) + "\n")

            if (it % cfg.checkpoint_interval == 0 or it == max_iters) \
                    and is_primary:
                # params/opt state are replicated, so process 0 holds the
                # whole tree; other hosts skip the write (reference analog:
                # mmcv CheckpointHook is rank-0-only)
                path = os.path.join(self.work_dir, f"iter_{it}")
                save_checkpoint(path, jax.tree.map(np.asarray, self.state),
                                step=it)
                logger.info("checkpoint -> %s", path)

        logger.info("training done: %d iters in %.1f min", max_iters,
                    (time.time() - t_start) / 60)
        return self.state
