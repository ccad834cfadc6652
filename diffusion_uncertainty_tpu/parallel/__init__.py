"""Device-mesh / sharding layer (data-parallel + ensemble-parallel sampling)."""

from .mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    local_shard_bounds,
)
