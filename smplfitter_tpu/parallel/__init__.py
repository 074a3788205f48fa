from .sharding import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    make_sharded_fit_fn,
    replicated,
    shard_batch,
)
