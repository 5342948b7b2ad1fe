"""Device-mesh parallelism: mesh construction and sharding helpers."""

from cellvit_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    seq_sharding,
    shard_batch,
)
from cellvit_tpu.parallel.pipeline import (  # noqa: F401
    make_pipe_mesh,
    pipeline_encoder_apply,
)
