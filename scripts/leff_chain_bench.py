#!/usr/bin/env python3
"""Chain experiment: run all 9 Uformer_B LeFF geometries fwd+bwd inside
ONE jitted grad program (like the train step does) and compare per-kernel
device time to the standalone per-stage numbers. Isolates whether the
in-step slowdown (profile_train: 139.5 ms bwd vs 53.8 ms standalone sum)
comes from multi-kernel interleaving or from the rest of the step."""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def stages(ps=128):
    r = ps
    return [
        ("enc0", r, 32, 1), ("enc1", r // 2, 64, 2),
        ("enc2", r // 4, 128, 8), ("enc3", r // 8, 256, 8),
        ("conv", r // 16, 512, 2),
        ("dec0", r // 8, 512, 8), ("dec1", r // 4, 256, 8),
        ("dec2", r // 2, 128, 2), ("dec3", r, 64, 1),
    ]


def main():
    from uformer_tpu.ops.pallas.leff import fused_leff_ad
    from uformer_tpu.utils.debug import summarize_trace

    B = int(os.environ.get("B", 32))
    ps = int(os.environ.get("PS", 128))
    iters = int(os.environ.get("ITERS", 6))
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    xs, ws = [], []
    reps = []
    for name, H, C, d in stages(ps):
        Ch = 4 * C
        xs.append(jnp.asarray(rng.standard_normal((B, H, H, C)), dt))
        ws.append(dict(
            w1=jnp.asarray(rng.standard_normal((C, Ch)) * 0.05, dt),
            b1=jnp.zeros((Ch,), dt),
            wd=jnp.asarray(rng.standard_normal((3, 3, Ch)) * 0.2, dt),
            bd=jnp.zeros((Ch,), dt),
            w2=jnp.asarray(rng.standard_normal((Ch, C)) * 0.05, dt),
            b2=jnp.zeros((C,), dt),
            ln_s=jnp.ones((C,), jnp.float32),
            ln_b=jnp.zeros((C,), jnp.float32),
        ))
        reps.append(d)

    def f(ws_in):
        tot = jnp.zeros((), jnp.float32)
        for x, w, d in zip(xs, ws_in, reps):
            y = x
            for _ in range(d):  # depth-many chained blocks per stage
                y = fused_leff_ad(y, w["w1"], w["b1"], w["wd"], w["bd"],
                                  w["w2"], w["b2"], ln_s=w["ln_s"],
                                  ln_b=w["ln_b"], residual=True)
            tot = tot + jnp.sum(y.astype(jnp.float32)) * 1e-6
        return tot

    g = jax.jit(jax.grad(f))
    out = g(ws)
    jax.block_until_ready(out)
    d = tempfile.mkdtemp(prefix="leffchain_")
    try:
        jax.profiler.start_trace(d)
        for _ in range(iters):
            out = g(ws)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        groups = summarize_trace(d, top=30)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    tot = 0.0
    for k, v in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"{k:<40} {v / iters:8.3f}")
        tot += v / iters
    print(f"chain total ms/step: {tot:.2f} "
          f"(standalone sums: fwd 20.3, bwd 53.8)")


if __name__ == "__main__":
    main()
