"""Multi-host (pod) initialization and rank-0 helpers.

The reference's multi-process story is torchrun + NCCL process groups
(``run_default.sh:52-56``, ``ddp_init_group``). TPU-native equivalent
(SURVEY.md §5.8): ``jax.distributed.initialize`` joins the hosts of a pod
slice over DCN; inside one slice, collectives ride ICI automatically via
GSPMD — there is no user-visible backend. Rank-0-only sections
(checkpoint writes, logging — reference ``if_main_process``) become
``is_main_process()``.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

__all__ = ["init_distributed", "is_main_process", "process_count",
           "gather_to_host", "process_row_block"]


def process_row_block(n_rows: int, row_multiple: int,
                      index: int, count: int):
    """The (lo, hi) row block process ``index`` owns in a global batch.

    Single source of truth for multi-host row partitioning: the trainer
    pads the batch to ``row_multiple`` (the mesh data-axis multiple) and
    ships rows [lo, hi) to its local devices (``_device_batch``), and
    the shard-aware loader decodes audio only for the same block
    (``BatchLoader.set_shard``) — both MUST agree or a host would ship
    zeros where real audio belongs."""
    if row_multiple % count:
        raise ValueError(
            f"row_multiple {row_multiple} not divisible by count {count}")
    padded = -(-int(n_rows) // int(row_multiple)) * int(row_multiple)
    per = padded // int(count)
    return index * per, (index + 1) * per

_INITIALIZED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join a multi-host JAX cluster; no-op for single-host runs.

    With no arguments, relies on the TPU pod runtime's automatic discovery
    (the common case on Cloud TPU); explicit args support manual setups.
    Safe to call unconditionally — the reference's ``ddp_init_group`` has
    the same always-called shape.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    import jax

    multi_host = (
        coordinator_address is not None
        or os.environ.get("COORDINATOR_ADDRESS")
        or int(os.environ.get("TPU_NUM_PROCESSES", "1")) > 1
    )
    if not multi_host:
        logger.debug("single-host run; skipping jax.distributed.initialize")
        _INITIALIZED = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    logger.info(
        "joined cluster: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def process_count() -> int:
    import jax

    return jax.process_count()


def gather_to_host(x):
    """Fetch a (possibly cross-host-sharded) array to host numpy.

    Single-host: plain ``np.asarray`` (zero overhead). Multi-host:
    ``np.asarray`` on an array sharded across processes raises (shards on
    other hosts are not addressable), so the global value is assembled
    with ``multihost_utils.process_allgather`` — every process gets the
    full array, matching the single-host semantics the metric/decode
    host boundaries assume."""
    import numpy as np

    import jax

    if jax.process_count() > 1 and isinstance(x, jax.Array) \
            and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)
