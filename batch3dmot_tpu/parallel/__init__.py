"""Device-mesh parallelism: data-parallel sharding of window batches."""

from batch3dmot_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch_fn,
)
