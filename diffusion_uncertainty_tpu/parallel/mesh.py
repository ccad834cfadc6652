"""Mesh construction and sharding helpers.

The reference's only parallelism is process-per-GPU index sharding with zero
inter-process communication (``torch.multiprocessing.spawn``,
``scripts/generate_dataset_score_uncertainty_imagenet.py:51-57,137-144``;
SURVEY.md §2.4). The TPU-native equivalent is a single program over a device
mesh:

  * axis "data"     — batch-sharded sampling / metrics (the reference's DP)
  * axis "ensemble" — the M uncertainty forwards are embarrassingly parallel
                      across chips inside the window; stacking them on a mesh
                      axis turns the reference's inner Python loop into an ICI
                      dimension (no reference analogue — TPU-first design)

Collectives ride XLA (psum/all_gather inserted from shardings); artifacts can
still be written as per-host shards for layout parity with the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch", "local_shard_bounds"]


def make_mesh(
    data: Optional[int] = None,
    ensemble: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D ("data",) or 2-D ("data","ensemble") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // ensemble
    need = data * ensemble
    if need > n:
        raise ValueError(f"data({data}) * ensemble({ensemble}) > devices({n})")
    arr = np.asarray(devices[:need]).reshape(data, ensemble)
    if ensemble == 1:
        return Mesh(arr.reshape(data), ("data",))
    return Mesh(arr, ("data", "ensemble"))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 on `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x: jax.Array, mesh: Mesh, axis: str = "data") -> jax.Array:
    """Place a host array batch-sharded on the mesh."""
    return jax.device_put(x, batch_sharding(mesh, x.ndim, axis))


def local_shard_bounds(total: int, rank: int, world: int) -> tuple[int, int]:
    """[start, stop) of this worker's contiguous index range — the reference's
    per-rank slice of the shared X_T/y tensors (``...imagenet.py:51-57``)."""
    per = total // world
    start = rank * per
    stop = total if rank == world - 1 else start + per
    return start, stop
