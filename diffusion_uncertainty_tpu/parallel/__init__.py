"""Device-mesh / sharding layer: data- + ensemble-parallel sampling,
tensor-parallel param specs for the multi-billion-param transformer families,
GPipe pipeline parallelism over depth, and ring-attention sequence
parallelism over tokens."""

from .mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    local_shard_bounds,
)
from .pp import (  # noqa: F401
    make_pp_mesh,
    stack_block_params,
    pipeline_apply,
)
from .sp import (  # noqa: F401
    make_sp_mesh,
    ring_attention,
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
