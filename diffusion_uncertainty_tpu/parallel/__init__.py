"""Device-mesh / sharding layer: data- + ensemble-parallel sampling, and
tensor-parallel param specs for the multi-billion-param transformer families."""

from .mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    local_shard_bounds,
)
from .tp import (  # noqa: F401
    param_shardings,
    shard_params,
    mmdit_tp_spec,
    flux_tp_spec,
    uvit_tp_spec,
    make_uvit_tp_spec,
    sd_unet_tp_spec,
)
