"""Multi-host initialization (SURVEY §2.7: subsumes the reference's dead
DDP flags, options.py:60-62).

On a multi-host TPU slice, call `init_multihost()` once per process before
any jax computation; the global mesh then spans all hosts (ICI intra-slice,
DCN across). Data loading stays per-host: `local_batch_slice` gives each
host its shard of the global batch.
"""

from __future__ import annotations

from typing import Optional


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-based auto-detection on TPU
    (no-op on a single process)."""
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def local_batch_slice(global_batch: int):
    """(start, size) of this host's slice of the global batch."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return i * per, per
