"""Device-mesh parallelism: mesh construction and sharding helpers."""

from cellvit_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    seq_sharding,
    shard_batch,
)
