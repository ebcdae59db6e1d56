from .mesh import (
    DATA_AXIS,
    data_sharding,
    initialize_distributed,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
