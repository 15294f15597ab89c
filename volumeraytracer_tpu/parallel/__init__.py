"""Multi-chip parallelism: meshes, sharded tracing, sharded training steps."""

from .shard import (
    make_mesh,
    make_train_step,
    replicate,
    shard_batch,
    trace_rays_sharded,
)

__all__ = [
    "make_mesh",
    "make_train_step",
    "replicate",
    "shard_batch",
    "trace_rays_sharded",
]
