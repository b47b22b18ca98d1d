#!/usr/bin/env python3
"""Per-stage microbenchmark of fused_leff / fused_leff_bwd at the
Uformer_B training geometry (bs=32, ps=128) — finds where the backward's
device time concentrates before optimizing it.

NOTE: wall-clock timing via block_until_ready under-reports on the axon
tunnel device (measured 0.04 ms wall vs 1.67 ms device for one call) —
every number here comes from a profiler trace instead."""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def stages(ps=128):
    # (name, H, C, depth) for Uformer_B at train ps
    r = ps
    return [
        ("enc0", r, 32, 1), ("enc1", r // 2, 64, 2),
        ("enc2", r // 4, 128, 8), ("enc3", r // 8, 256, 8),
        ("conv", r // 16, 512, 2),
        ("dec0", r // 8, 512, 8), ("dec1", r // 4, 256, 8),
        ("dec2", r // 2, 128, 2), ("dec3", r, 64, 1),
    ]


def device_time(fns, iters=10):
    """Per-call device ms for each named fn, from one profiler trace."""
    from uformer_tpu.utils.debug import summarize_trace

    outs = [fn() for fn in fns.values()]
    jax.block_until_ready(outs)
    d = tempfile.mkdtemp(prefix="leffbench_")
    try:
        jax.profiler.start_trace(d)
        for fn in fns.values():
            for _ in range(iters):
                o = fn()
        jax.block_until_ready(o)
        jax.profiler.stop_trace()
        groups = summarize_trace(d, top=100)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return {k: groups.get(k, 0.0) / iters for k in fns}


def main():
    from uformer_tpu.ops.pallas.leff import fused_leff, fused_leff_bwd

    B = int(os.environ.get("B", 32))
    ps = int(os.environ.get("PS", 128))
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    tot_f = tot_b = tot_b16 = 0.0
    print(f"{'stage':<6} {'H':>4} {'C':>4} {'d':>2} "
          f"{'fwd_ms':>8} {'bwd_ms':>8} {'bwd/fwd':>7}  (x depth totals)")
    for name, H, C, d in stages(ps):
        Ch = 4 * C
        x = jnp.asarray(rng.standard_normal((B, H, H, C)), dt)
        dy = jnp.asarray(rng.standard_normal((B, H, H, C)), dt)
        w1 = jnp.asarray(rng.standard_normal((C, Ch)) * 0.05, dt)
        b1 = jnp.zeros((Ch,), dt)
        wd = jnp.asarray(rng.standard_normal((3, 3, Ch)) * 0.2, dt)
        bd = jnp.zeros((Ch,), dt)
        w2 = jnp.asarray(rng.standard_normal((Ch, C)) * 0.05, dt)
        b2 = jnp.zeros((C,), dt)
        ln_s = jnp.ones((C,), jnp.float32)
        ln_b = jnp.zeros((C,), jnp.float32)

        t = device_time({
            "fused_leff": lambda: fused_leff(
                x, w1, b1, wd, bd, w2, b2, ln_s, ln_b, residual=True),
            "fused_leff_bwd": lambda: fused_leff_bwd(
                x, dy, w1, b1, wd, bd, w2, ln_s, ln_b, residual=True,
                conv_f32=True),
        })
        f, bwd = t["fused_leff"], t["fused_leff_bwd"]
        tot_f += f * d
        tot_b += bwd * d
        print(f"{name:<6} {H:>4} {C:>4} {d:>2} {f:>8.3f} {bwd:>8.3f} "
              f"{bwd / max(f, 1e-9):>7.2f}  "
              f"({f * d:7.2f} / {bwd * d:7.2f})",
              flush=True)
    print(f"totals: fwd {tot_f:.1f} ms  bwd_f32 {tot_b:.1f} ms")


if __name__ == "__main__":
    main()
