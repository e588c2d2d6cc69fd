"""Device mesh + sharding helpers.

The reference's only distribution strategy is NCCL data parallelism
(SURVEY.md §2.3); here the equivalent is a named ``jax.sharding.Mesh`` with
XLA collectives over ICI.  The mesh carries axes for data (episodes/batch)
and model (spatial) sharding; single-chip runs use a trivial 1-device mesh so
all code paths are mesh-agnostic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Optional[dict] = None, devices=None) -> Mesh:
    """Build a named mesh.

    Args:
      axes: {axis_name: size} in order; -1 for one axis means "use all
        remaining devices".  Default: {'data': n_devices}.
      devices: explicit device list (default jax.devices()).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axes is None:
        axes = {"data": n}
    names = list(axes.keys())
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    if total != n:
        raise ValueError(f"mesh axes {axes} need {total} devices, have {n}")
    arr = np.array(devices).reshape(sizes)
    return Mesh(arr, tuple(names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch/episode) axis across ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
