from .sharding import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    make_sharded_fit_fn,
    padded_global_batch,
    replicated,
    shard_batch,
)
