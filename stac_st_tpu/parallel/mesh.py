"""Device mesh construction and sharding rules.

The reference scales via single-node NCCL DDP (``run_default.sh:52-56``,
``ddp_init_group`` — SURVEY.md §2.4). The TPU-native equivalent: one jitted
train step compiled over a ``jax.sharding.Mesh`` with the batch sharded on
the ``data`` axis and parameters replicated; XLA inserts the gradient
all-reduce over ICI (GSPMD — no user-visible collectives). Multi-host pods
extend the same mesh over DCN via ``jax.distributed.initialize``.

A ``model`` axis is provisioned for tensor-parallel sharding of the larger
configs (d1024 'large' preset); with ``model=1`` it is inert and the layout
reduces to pure DP.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "local_device_count"]


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(
    data: int = -1, model: int = 1, devices=None
) -> Mesh:
    """Build a (data, model) mesh. data=-1 ⇒ all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    devices = devices[: data * model].reshape(data, model)
    return Mesh(devices, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch_arrays: dict) -> dict:
    """Device-put a dict of host arrays with batch-dim sharding."""
    sharding = batch_sharding(mesh)
    out = {}
    for key, value in batch_arrays.items():
        out[key] = jax.device_put(value, sharding)
    return out
