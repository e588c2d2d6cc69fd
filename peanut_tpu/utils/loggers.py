"""Training logger hooks (mmseg TextLoggerHook / MMSegWandbHook parity).

The runner writes JSONL natively; these hooks add pluggable sinks: a text
console formatter and a wandb sink that activates only if wandb is
importable (it is not in the baked image — the hook degrades to a no-op
with a one-time notice, keeping configs portable).
"""

from __future__ import annotations

import json
import logging
from typing import Dict, List, Optional

logger = logging.getLogger("peanut_tpu")


class LoggerHook:
    def log(self, record: Dict) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class TextLoggerHook(LoggerHook):
    """Console formatter matching the reference's text log shape."""

    def log(self, record: Dict) -> None:
        it = record.get("iter", "?")
        parts = [f"Iter [{it}]"]
        for k, v in record.items():
            if k == "iter":
                continue
            parts.append(f"{k}: {v:.4f}" if isinstance(v, float) else
                         f"{k}: {v}")
        logger.info(", ".join(parts))


class WandbLoggerHook(LoggerHook):
    """W&B sink (MMSegWandbHook parity); no-op when wandb is unavailable."""

    def __init__(self, project: str = "peanut-tpu", **init_kw):
        try:
            import wandb

            self._run = wandb.init(project=project, **init_kw)
            self._wandb = wandb
        except ImportError:
            logger.info("wandb not installed; WandbLoggerHook is a no-op")
            self._run = None
            self._wandb = None

    def log(self, record: Dict) -> None:
        if self._run is not None:
            step = record.get("iter")
            self._wandb.log({k: v for k, v in record.items() if k != "iter"},
                            step=step)


class CompositeLogger(LoggerHook):
    def __init__(self, hooks: List[LoggerHook]):
        self.hooks = hooks

    def log(self, record: Dict) -> None:
        for h in self.hooks:
            h.log(record)


def read_train_log(path: str) -> List[Dict]:
    """Parse a runner train_log.jsonl (tools/analyze_logs.py input)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out
