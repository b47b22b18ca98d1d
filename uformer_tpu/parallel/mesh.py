"""Device mesh and sharding layout.

The reference's only distribution strategy is single-process DataParallel
(`/root/reference/train/train_denoise.py:83`) with NCCL underneath; its DDP
flags are dead (`options.py:60-62`). Here distribution is first-class:
one `jax.sharding.Mesh` with ('data', 'model') axes; batches shard over
'data', parameters are replicated (Uformer_B is ~50M params — replication
is the right call), with an optional 'model' axis reserved for sharding
the widest kernels if a future config needs it. XLA inserts the gradient
all-reduce over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              data: Optional[int] = None, model: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh; defaults to all devices on 'data'."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading dim sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the leading axis split over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a host tree over the whole mesh.

    CALLER CONTRACT (multi-process): every process must pass
    host-identical leaf values — same-seed init or a checkpoint restored
    by all processes. The multi-process path builds the global replicated
    array from per-host local copies WITHOUT any cross-host guard
    collective (see `put` below for why); divergent inputs would silently
    produce disagreeing shards. Set UFORMER_TPU_VERIFY_REPLICATE=1 to run
    a one-scalar checksum allgather that asserts the contract (debug
    only: it pays one small collective per `replicate` call).
    """
    import os

    s = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)

    if os.environ.get("UFORMER_TPU_VERIFY_REPLICATE") == "1":
        import zlib

        from jax.experimental import multihost_utils

        crc = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            crc = zlib.crc32(np.ascontiguousarray(leaf).tobytes(), crc)
        all_crc = np.asarray(
            multihost_utils.process_allgather(np.uint32(crc)))
        if not (all_crc == all_crc[0]).all():
            raise ValueError(
                "replicate() caller contract violated: leaf checksums "
                f"differ across processes: {all_crc.tolist()}")

    def put(x):
        # Multi-process: `device_put` with a global sharding runs a guard
        # collective per leaf (dispatch.py device_put -> assert_equal ->
        # process_allgather). That collective builds a FRESH gloo/NCCL
        # clique whose handshake has a hard ~30 s deadline — any >30 s
        # compile skew between processes (common: independent jit
        # compiles) deadlocks the whole job. Every caller passes
        # host-identical values (same-seed init, restored checkpoints),
        # so build the global replicated array from local per-device
        # copies directly — no collective at all.
        x = np.asarray(x)
        local = [d for d in mesh.devices.flat
                 if d.process_index == jax.process_index()]
        return jax.make_array_from_single_device_arrays(
            x.shape, s, [jax.device_put(x, d) for d in local])

    return jax.tree_util.tree_map(put, tree)
