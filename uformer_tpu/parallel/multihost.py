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


def local_batch_range(sharding, global_batch: int):
    """(start, size) of the global batch-dim rows this process's devices
    own under `sharding` — derived from the sharding's device->index map
    rather than assumed from process_index, so it stays correct for any
    mesh device order. Asserts the rows form one contiguous range (true
    for a batch-sharded ('data','model') mesh built from jax.devices())."""
    import jax

    if jax.process_count() == 1:
        return 0, global_batch
    m = sharding.devices_indices_map((global_batch,))
    rows = set()
    for d in sharding.addressable_devices:
        sl = m[d][0]
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else global_batch
        rows.update(range(start, stop))
    lo, hi = min(rows), max(rows) + 1
    assert rows == set(range(lo, hi)), (
        "non-contiguous local batch rows under this mesh; reorder the "
        f"mesh devices (rows={sorted(rows)})")
    return lo, hi - lo


def make_global_batch(local_batch: dict, sharding, global_batch: int):
    """Assemble a global jax.Array batch from this process's local rows
    (the reference's DataLoader feeds one process,
    train_denoise.py:128-134; here each host loads only its shard and the
    global array spans hosts). Single-process: a plain device_put."""
    import jax

    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, a, (global_batch,) + tuple(a.shape[1:])),
        local_batch)
