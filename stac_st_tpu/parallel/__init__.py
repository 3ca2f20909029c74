"""Parallelism: mesh construction and sharding helpers."""

from .mesh import (
    batch_sharding,
    local_device_count,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding", "local_device_count", "make_mesh", "replicated",
    "shard_batch",
]
