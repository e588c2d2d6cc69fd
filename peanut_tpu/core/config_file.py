"""Python-file model configs (mmcv Config.fromfile parity).

The reference's model zoo is driven by python config files with ``_base_``
inheritance (prediction/configs/**; loaded via mmcv Config at
nav/agent/prediction.py:146).  This loader executes a config file in an
isolated namespace, resolves ``_base_`` chains (later files override
earlier, dicts merge recursively, ``_delete_=True`` replaces), and returns a
plain nested dict — so reference-style config trees drive the registry
builders here unchanged.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Union

DELETE_KEY = "_delete_"
BASE_KEY = "_base_"


def _exec_file(path: str) -> Dict[str, Any]:
    ns: Dict[str, Any] = {}
    with open(path) as f:
        code = compile(f.read(), path, "exec")
    exec(code, ns)
    return {k: v for k, v in ns.items()
            if not k.startswith("__") and not callable(v)
            and not isinstance(v, type(os))}


def merge_dict(base: Dict, override: Dict) -> Dict:
    """Recursive merge with mmcv semantics (_delete_ replaces subtrees)."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, dict) and v.pop(DELETE_KEY, False):
            out[k] = copy.deepcopy(v)
        elif isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_dict(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_config(path: str) -> Dict[str, Any]:
    """Load a python config file, resolving _base_ inheritance."""
    path = os.path.abspath(path)
    cfg = _exec_file(path)
    bases = cfg.pop(BASE_KEY, [])
    if isinstance(bases, str):
        bases = [bases]
    merged: Dict[str, Any] = {}
    for b in bases:
        merged = merge_dict(merged, load_config(
            os.path.join(os.path.dirname(path), b)))
    return merge_dict(merged, cfg)


def dump_config(cfg: Dict[str, Any], path: str):
    """Write a config dict back out as a python file."""
    import pprint

    with open(path, "w") as f:
        for k, v in cfg.items():
            f.write(f"{k} = {pprint.pformat(v, width=88)}\n")
