"""Multi-host initialisation and on-mesh metric reductions.

Replaces the reference's two distribution mechanisms (SURVEY.md §5.8):
``torch.multiprocessing.spawn`` with per-rank artifact files + offline concat
(main path) and the vendored MPI rendezvous/param-broadcast
(``metrics/iddpm/dist_util.py:21-72``). TPU-native equivalents:

  * ``initialize()`` — ``jax.distributed`` per host; every host reads its own
    checkpoint shards (orbax), no broadcast step;
  * ``sharded_feature_stats`` — FID feature statistics reduced across the mesh
    with ``psum`` inside ``shard_map`` instead of per-rank files: the (count,
    Σx, Σxxᵀ) sums arrive identical on every host, ready for the float64 host
    Fréchet math.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 top-level export; fall back for older stacks
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["initialize", "process_info", "sharded_feature_stats"]


def initialize(coordinator_address: Optional[str] = None, **kwargs) -> None:
    """``jax.distributed.initialize`` wrapper.

    No-op when the runtime is already multi-process (initialise exactly once)
    or when no coordinator is given (single-process run).
    """
    if jax.process_count() > 1:
        return  # runtime already initialised as multi-process
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def sharded_feature_stats(
    extract_fn: Callable[[jnp.ndarray], jnp.ndarray],  # [b,H,W,3] -> [b,D]
    images: jnp.ndarray,  # [B, H, W, 3] (global batch, divisible by mesh data axis)
    mesh: Mesh,
    dim: int,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """(Σx, Σxxᵀ, count) of features, reduced over the mesh's "data" axis with
    psum — every host gets the full-population sums (vs the reference's
    per-rank ``uncertainty_{gpu}.pth`` + offline concatenation)."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P("data"),
        out_specs=(P(), P(), P()),
    )
    def stats(img_shard):
        f = extract_fn(img_shard).astype(jnp.float32)
        s1 = jax.lax.psum(jnp.sum(f, axis=0), "data")
        s2 = jax.lax.psum(f.T @ f, "data")
        n = jax.lax.psum(jnp.asarray(img_shard.shape[0], jnp.float32), "data")
        return s1, s2, n

    s1, s2, n = jax.jit(stats)(images)
    return np.asarray(s1, np.float64), np.asarray(s2, np.float64), int(n)
