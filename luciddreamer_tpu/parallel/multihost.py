"""Multi-host orchestration helpers.

The reference has no multi-node support in its pipeline (only the vendored
ZoeDepth DDP trainer, SLURM-launched, train_mono.py:138-174).  Here:
``initialize()`` wires jax.distributed (ICI within a slice, DCN across
hosts — XLA routes collectives transparently once the global mesh exists),
and the helpers shard host-local work (cameras, video frames) by process.
"""
from __future__ import annotations

import os

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """jax.distributed.initialize with env-var fallbacks
    (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or the TPU
    runtime's automatic discovery).  No-op when single-process."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if coordinator_address is None and num_processes in (None, 1):
        return False          # single host; nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_shard(items: list, axis_size: int | None = None,
                index: int | None = None) -> list:
    """Round-robin split of host-side work (e.g. video frames to encode,
    cameras to stage) across processes."""
    n = axis_size if axis_size is not None else jax.process_count()
    i = index if index is not None else jax.process_index()
    return items[i::n]


def global_mesh(data: int = 1, tiles: int | None = None):
    """A mesh over ALL devices in the job (every host's chips), shaped
    (data, tiles) like parallel.sharded expects."""
    from luciddreamer_tpu.parallel.sharded import make_mesh

    return make_mesh(jax.devices(), data=data, tiles=tiles)
