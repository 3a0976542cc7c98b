from patch2pix_tpu.parallel.mesh import (
    data_sharding,
    initialize_multihost,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "data_sharding",
    "initialize_multihost",
    "make_mesh",
    "replicated",
    "shard_batch",
]
