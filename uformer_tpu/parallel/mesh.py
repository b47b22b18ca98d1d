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
    s = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)

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
