"""Profile the flagship Uformer_B forward on the attached TPU and print the
per-op-family device-time breakdown (ms per iteration).

Separates fused-kernel time from XLA glue (LN / roll / window partition /
resampling convs) so optimization effort lands on the biggest bucket.

Usage: python scripts/profile_forward.py [--batch 8] [--size 256] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--arch", default="Uformer_B")
    ap.add_argument("--instances", action="store_true",
                    help="per-instance op names instead of families")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from uformer_tpu.models.registry import get_arch
    from uformer_tpu.utils import init_params_fast
    from uformer_tpu.utils.debug import summarize_trace

    model = get_arch({"arch": args.arch, "train_ps": args.size,
                      "dtype": jnp.bfloat16})
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(args.batch, args.size, args.size, 3)).astype(np.float32),
        jnp.bfloat16)
    params = init_params_fast(model, x, rng=rng)

    fwd = jax.jit(lambda p, z: model.apply(p, z, deterministic=True))
    out = fwd(params, x)
    out.block_until_ready()

    d = tempfile.mkdtemp(prefix="uprof_")
    try:
        jax.profiler.start_trace(d)
        for _ in range(args.iters):
            out = fwd(params, x)
        out.block_until_ready()
        jax.profiler.stop_trace()
        groups = summarize_trace(d, top=args.top,
                                 instances=args.instances)
    finally:
        shutil.rmtree(d, ignore_errors=True)

    tot = sum(groups.values()) / args.iters
    fused = sum(v for k, v in groups.items() if "fused" in k) / args.iters
    print(f"{'op family':<48} {'ms/iter':>9} {'%':>6}")
    for k, v in groups.items():
        ms = v / args.iters
        print(f"{k:<48} {ms:9.3f} {100 * ms / tot:5.1f}%")
    print(f"\ntotal device: {tot:.2f} ms/iter   fused kernels: {fused:.2f} "
          f"ms/iter   glue: {tot - fused:.2f} ms/iter")


if __name__ == "__main__":
    main()
