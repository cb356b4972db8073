"""Device mesh + sharding (replaces the reference's NCCL stack)."""
from .mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .tp import (  # noqa: F401
    MODEL_AXIS,
    infer_waveglow_tp,
    shard_waveglow_params,
)
