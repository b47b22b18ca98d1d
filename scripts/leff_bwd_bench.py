#!/usr/bin/env python3
"""Per-stage fused_leff_bwd (and fwd) microbench at the TRAIN recipe's
geometries (Uformer_B, ps=128, bs=32): the training profile's dominant
entry (fused_leff_bwd ~50 ms of 144 ms/step at round 5 HEAD). A/B the
whole-image 2-image interleave with UFORMER_TPU_LEFF_ILEAVE=1|2.

Usage: python scripts/leff_bwd_bench.py [--batch 32] [--ps 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, reso@ps128, C) for Uformer_B; depth folded into model-ms
STAGES = [
    ("enc0", 128, 32, 1),
    ("enc1", 64, 64, 2),
    ("enc2", 32, 128, 8),
    ("enc3", 16, 256, 8),
    ("conv", 8, 512, 2),
    ("dec0", 16, 512, 8),
    ("dec1", 32, 256, 8),
    ("dec2", 64, 128, 2),
    ("dec3", 128, 64, 1),
]

ITERS = 30


def measure(call, z, ws):
    import jax

    @jax.jit
    def loop(z, ws, n):
        def body(i, z):
            outs = call(z, ws)
            # fold dx back in to chain iterations
            return z * 0.0 + outs[0]
        return jax.lax.fori_loop(0, n, body, z)

    r = loop(z, ws, 1)
    _ = float(jax.numpy.asarray(r)[0, 0, 0, 0])
    t1 = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        r = loop(z, ws, 1)
        _ = float(jax.numpy.asarray(r)[0, 0, 0, 0])
        t1 = min(t1, time.perf_counter() - t0)
    t0 = time.perf_counter()
    r = loop(z, ws, ITERS + 1)
    _ = float(jax.numpy.asarray(r)[0, 0, 0, 0])
    t = time.perf_counter() - t0
    return max(t - t1, 1e-9) / ITERS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ps", type=int, default=128)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    from uformer_tpu.ops.pallas.leff import fused_leff, fused_leff_bwd

    B = args.batch
    il = os.environ.get("UFORMER_TPU_LEFF_ILEAVE", "2")
    print(f"# leff bwd/fwd per stage, B={B} ps={args.ps} ILEAVE={il}",
          flush=True)
    tot_b = tot_f = 0.0
    for name, reso, C, depth in STAGES:
        reso = reso * args.ps // 128
        Ch = 4 * C
        rng = np.random.default_rng(0)
        r = lambda *s: jnp.asarray(  # noqa: E731
            rng.normal(size=s).astype(np.float32) * 0.05, jnp.bfloat16)
        x = jnp.asarray(
            rng.normal(size=(B, reso, reso, C)).astype(np.float32) * 0.3,
            jnp.bfloat16)
        ws = (r(B, reso, reso, C),  # dy
              r(C, Ch), jnp.zeros((Ch,), jnp.bfloat16), r(3, 3, Ch),
              jnp.zeros((Ch,), jnp.bfloat16), r(Ch, C),
              jnp.zeros((C,), jnp.bfloat16),
              jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32))

        def call_bwd(z, ws):
            dy, w1, b1, wd, bd, w2, b2, ln_s, ln_b = ws
            return fused_leff_bwd(z, dy, w1, b1, wd, bd, w2, ln_s, ln_b,
                                  has_ln=True, residual=True)

        def call_fwd(z, ws):
            dy, w1, b1, wd, bd, w2, b2, ln_s, ln_b = ws
            return (fused_leff(z, w1, b1, wd, bd, w2, b2, ln_s=ln_s,
                               ln_b=ln_b, residual=True),)

        tb = measure(call_bwd, x, ws) * 1e3
        tf = measure(call_fwd, x, ws) * 1e3
        tot_b += tb * depth
        tot_f += tf * depth
        print(f"{name:6s} C{C:<4d} {reso}² bwd {tb:8.3f} ms  "
              f"fwd {tf:8.3f} ms  (xdep {depth})", flush=True)
    print(f"model total: bwd {tot_b:.2f} ms, fwd {tot_f:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
