"""Multi-host (multi-process) initialization.

The reference has no distributed runtime at all (SURVEY §2.4). Here a
pod slice or CPU test cluster forms via `jax.distributed`: every
process calls :func:`initialize` (args or env), after which
`jax.devices()` spans all hosts and the (dp, ep) mesh + sharded train
step work unchanged — collectives ride ICI within a slice and DCN
across slices, inserted by XLA from the same sharding annotations.

Environment variables (used when args are omitted):
    DEEPRANK_COORDINATOR   e.g. "10.0.0.1:9876"
    DEEPRANK_NUM_PROCESSES e.g. "4"
    DEEPRANK_PROCESS_ID    e.g. "0"
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    coordinator_address = coordinator_address or os.environ.get(
        "DEEPRANK_COORDINATOR"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("DEEPRANK_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("DEEPRANK_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if coordinator_address is None:
        return  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_count() -> int:
    try:
        return jax.process_count()
    except Exception:
        return 1
