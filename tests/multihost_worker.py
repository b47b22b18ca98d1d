"""Subprocess worker for the 2-process CPU multi-host test.

Each process owns 2 virtual CPU devices (4 global). Runs one Trainer
epoch on a synthetic paired dataset through the multi-host data plane
(local-shard loading -> make_array_from_process_local_data assembly),
then prints the final loss and a param checksum so the parent can assert
cross-process agreement.

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id>
"""

import faulthandler
import os
import signal
import sys

# debugging aid for distributed hangs: `kill -USR1 <pid>` dumps all
# Python thread stacks to stderr (captured by the parent test)
faulthandler.register(signal.SIGUSR1, all_threads=True)
faulthandler.dump_traceback_later(240, exit=False)

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# cross-process collectives on the CPU backend need an explicit transport
jax.config.update("jax_cpu_collectives_implementation", "gloo")

coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(coordinator_address=coord,
                           num_processes=n_proc, process_id=pid,
                           local_device_ids=[0, 1])

import numpy as np  # noqa: E402

from uformer_tpu.config import Options  # noqa: E402
from uformer_tpu.train.trainer import Trainer  # noqa: E402

assert jax.device_count() == 2 * n_proc, jax.devices()
assert jax.local_device_count() == 2

# establish the gloo contexts while both processes are at the same point —
# clique initialization has a hardcoded 30s key-value deadline that the
# train step's first collective would miss whenever the two processes'
# independent jit compiles skew by more than that. Warm (a) the
# per-process barrier clique and (b) the all-devices reduce clique the
# training psum uses; established cliques have no such deadline.
from jax.experimental import multihost_utils  # noqa: E402

multihost_utils.sync_global_devices("multihost_worker_start")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec  # noqa: E402

from uformer_tpu.parallel import make_mesh  # noqa: E402

_mesh = make_mesh(jax.devices(), data=jax.device_count(), model=1)
_ones = jax.make_array_from_process_local_data(
    NamedSharding(_mesh, PartitionSpec("data")),
    __import__("numpy").ones((2,), "float32"),
    (jax.device_count(),))
assert float(jax.jit(jnp.sum)(_ones)) == jax.device_count()
multihost_utils.sync_global_devices("multihost_worker_cliques")


class SyntheticPairs:
    """Deterministic paired dataset (no augmentation RNG, so every host
    computes identical global batches from its local rows)."""

    def __init__(self, n=8, ps=32):
        rng = np.random.default_rng(0)
        self.gt = rng.random((n, ps, ps, 3), np.float32)
        self.noisy = np.clip(
            self.gt + 0.1 * rng.standard_normal((n, ps, ps, 3)), 0, 1
        ).astype(np.float32)

    def __len__(self):
        return len(self.gt)

    def __getitem__(self, i):
        return self.gt[i], self.noisy[i]


def main():
    tmp = sys.argv[4]
    # UNet, not Uformer: this test proves the multi-process DATA PLANE
    # and trainer protocol (sharded loading, global-batch assembly,
    # collective-free init/save), which are model-agnostic. The conv
    # UNet compiles in seconds; an 18-block Uformer train step took
    # XLA:CPU minutes PER PROCESS on 1-core CI hosts (2 processes
    # compile serially there -> spurious 600 s timeouts).
    opt = Options(
        arch="UNet", embed_dim=8, win_size=2, train_ps=32, batch_size=4,
        nepoch=1, dtype="float32", save_dir=tmp, mode="denoising",
        warmup=False, checkpoint=1, workers=1, mesh_model=1,
        attn_backend="jnp", pretrain_weights="",
    )
    tr = Trainer(opt)
    ds = SyntheticPairs(n=8, ps=32)
    state, best = tr.fit(train_dataset=ds, val_dataset=ds)
    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(np.abs(np.asarray(x)).sum() for x in leaves))
    print(f"MHRESULT pid={pid} step={int(state.step)} "
          f"checksum={checksum:.6f} best={best:.4f}", flush=True)


if __name__ == "__main__":
    main()
