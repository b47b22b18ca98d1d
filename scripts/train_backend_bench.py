"""Compare train-step time: fused Pallas kernels (remat-jnp VJP) vs the
pure-XLA jnp path, on the reference denoise recipe shape (Uformer_B,
batch 32, patch 128²).

The fused kernels carry a custom_vjp whose backward rematerializes the jnp
reference implementation; this quantifies whether that hybrid beats XLA
end-to-end autodiff (VERDICT r1 item 2).

Usage: python scripts/train_backend_bench.py [--backend pallas|jnp|both]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(backend: str, batch: int, ps: int) -> float:
    import jax
    import jax.numpy as jnp

    from uformer_tpu import get_arch
    from uformer_tpu.train.schedules import warmup_cosine_schedule
    from uformer_tpu.train.train_step import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from uformer_tpu.utils import init_params_fast

    if backend == "jnp":
        # force every backend resolution (attention AND LeFF dwconv) to jnp
        import uformer_tpu.ops.attention as att

        att.resolve_backend = lambda b="auto": "jnp"

    model = get_arch({"arch": "Uformer_B", "train_ps": ps,
                      "dtype": jnp.bfloat16, "attn_backend": backend})
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, ps, ps, 3)).astype(np.float32))
    params = init_params_fast(model, x)
    tx = make_optimizer(warmup_cosine_schedule(2e-4, 250, 1000, 3))
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, mixup_after_epoch=5,
                                   steps_per_epoch=1000))
    key = jax.random.PRNGKey(0)

    def chained(n):
        t0 = time.perf_counter()
        s, z = state, x
        for _ in range(n):
            s, loss = step(s, {"input": z, "target": x}, key)
            z = x + 0.0 * loss
        _ = float(np.asarray(z[0, 0, 0, 0]))
        return time.perf_counter() - t0

    chained(2)
    t1 = min(chained(1) for _ in range(3))
    times = [(max(chained(4) - t1, 1e-9)) / 3 for _ in range(5)]
    return float(np.percentile(times, 50))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=["pallas", "jnp", "both"],
                    default="both")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ps", type=int, default=128)
    args = ap.parse_args()

    backends = ([args.backend] if args.backend != "both"
                else ["jnp", "pallas"])
    if len(backends) > 1:
        # separate subprocesses: the jnp monkeypatch must not leak
        import subprocess
        for b in backends:
            subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--backend", b, "--batch", str(args.batch),
                            "--ps", str(args.ps)])
        return

    t = measure(backends[0], args.batch, args.ps)
    print(f"backend={backends[0]:<7} train_step_ms={t * 1e3:8.2f} "
          f"steps/s={1 / t:6.2f}", flush=True)


if __name__ == "__main__":
    main()
