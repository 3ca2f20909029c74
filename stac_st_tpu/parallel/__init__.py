"""Parallelism: mesh construction, sharding helpers, pipeline parallelism."""

from .mesh import (
    batch_sharding,
    local_device_count,
    make_mesh,
    replicated,
    shard_batch,
)
from .pipeline import make_pipe_mesh, pipeline_apply, stack_layer_params

__all__ = [
    "batch_sharding", "local_device_count", "make_mesh", "replicated",
    "shard_batch", "make_pipe_mesh", "pipeline_apply", "stack_layer_params",
]
