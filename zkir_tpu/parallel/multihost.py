"""Multi-host orchestration.

Cross-host scaling per SURVEY §2.4/§5: ``jax.distributed.initialize`` sets
up the process group; within a slice the collectives in
``zkir_tpu.parallel.distributed`` ride ICI, across hosts they ride DCN with
no code changes (the mesh spans all processes' devices).  I/O tapes and
program loading are host-local (each process feeds its own lanes).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed.  No-ops when already initialized or when
    running single-process (the common dev case)."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info():
    """(process_index, process_count, local_device_count, global_devices)."""
    return (
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        len(jax.devices()),
    )


def local_lane_slice(total_lanes: int):
    """The half-open lane range this host owns under even sharding —
    host-local input tapes are built for exactly these lanes."""
    per = total_lanes // jax.process_count()
    start = jax.process_index() * per
    return start, start + per
