"""Multi-host training tests.

The reference's multi-GPU story is single-process DataParallel
(train_denoise.py:83) with dead DDP flags (options.py:60-62); this
framework's successor is jax.distributed + a sharded data plane. The
heavy proof is a REAL 2-process CPU run (gloo collectives) through the
full Trainer: each process loads only its shard of every global batch,
the prefetch assembles cross-host global arrays, and both processes end
with identical params.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_local_batch_range_single_process():
    from uformer_tpu.parallel import batch_sharding, make_mesh
    from uformer_tpu.parallel.multihost import local_batch_range

    import jax

    mesh = make_mesh(jax.devices(), data=4, model=2)
    assert local_batch_range(batch_sharding(mesh), 32) == (0, 32)


def test_batch_iterator_local_range():
    from uformer_tpu.data.datasets import batch_iterator

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            a = np.full((4, 4, 3), float(i), np.float32)
            return a, a

    full = list(batch_iterator(DS(), 4, shuffle=True, seed=7))
    half = list(batch_iterator(DS(), 4, shuffle=True, seed=7,
                               local_range=(2, 2)))
    assert len(full) == len(half)
    for f, h in zip(full, half):
        np.testing.assert_array_equal(f["input"][2:4], h["input"])


@pytest.mark.slow
def test_two_process_cpu_training(tmp_path):
    """Spawn 2 jax.distributed processes (2 virtual CPU devices each);
    both run one Trainer epoch over the sharded data plane and must agree
    on the final step count and a param checksum."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             coord, "2", str(i), str(tmp_path / f"p{i}")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
    results = {}
    for out in outs:
        m = re.search(r"MHRESULT pid=(\d+) step=(\d+) "
                      r"checksum=([\d.]+) best=([\d.]+)", out)
        assert m, f"no MHRESULT in:\n{out[-4000:]}"
        results[int(m.group(1))] = (int(m.group(2)), float(m.group(3)))
    assert set(results) == {0, 1}
    assert results[0][0] == results[1][0] > 0          # same step count
    assert abs(results[0][1] - results[1][1]) < 1e-3   # same params
