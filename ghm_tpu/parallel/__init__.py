"""Device mesh, sharding, and sweep parallelism."""

from ghm_tpu.parallel.mesh import (
    Mesh,
    NamedSharding,
    P,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "Mesh",
    "NamedSharding",
    "P",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
]
