from gavit_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    data_feed_spec,
    replicated_sharding,
    shard_batch,
)
