#!/usr/bin/env python3
"""Per-variant cold-compile cost on hardware (VERDICT r4 item 5).

bench_infer's cold compile is one opaque number (201.3 s at the last
capture). This times `jit(call).lower(...).compile()` for every Mosaic
kernel variant the model builds (geometries mirror
scripts/kernel_bench.py / scripts/count_kernel_variants.py), so the
split between Mosaic compiles and the rest of the XLA module becomes a
table:

    python scripts/compile_cost.py [--batch 8] [--kernel all]

Each compile runs in THIS process against a fresh temp compilation-cache
dir (UFORMER_TPU_NO_CACHE inherited by uformer_tpu.__init__ keeps the
shared persistent cache out of the measurement).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["UFORMER_TPU_NO_CACHE"] = "1"

# (name, reso, C, heads, depth) for Uformer_B @ 256 — keep in sync with
# scripts/kernel_bench.py STAGES.
STAGES = [
    ("enc0", 256, 32, 1, 1),
    ("enc1", 128, 64, 2, 2),
    ("enc2", 64, 128, 4, 8),
    ("enc3", 32, 256, 8, 8),
    ("conv", 16, 512, 16, 2),
    ("dec0", 32, 512, 16, 8),
    ("dec1", 64, 256, 8, 8),
    ("dec2", 128, 128, 4, 2),
    ("dec3", 256, 64, 2, 1),
]

ROWFMT = "{0:<24} {1:9.2f} s"


def _time_compile(call, *args):
    import jax

    t0 = time.perf_counter()
    jax.jit(call).lower(*args).compile()
    return time.perf_counter() - t0


def rows_attn_image(B):
    import jax.numpy as jnp

    from uformer_tpu.ops.pallas.attention_image import fused_attention_image

    win = 8
    out = []
    for name, reso, C, nH, _depth in STAGES:
        if C % 128 and (128 % C or C < 32):
            continue
        D = C // nH
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, reso, reso, C))
                        .astype(np.float32) * 0.3, jnp.bfloat16)
        r = lambda *s: jnp.asarray(  # noqa: E731
            rng.normal(size=s).astype(np.float32) * 0.05, jnp.bfloat16)
        ws = (r(64, C), jnp.ones((C,), jnp.float32),
              jnp.zeros((C,), jnp.float32),
              r(C, C), jnp.zeros((C,), jnp.bfloat16), r(C, 2 * C),
              jnp.zeros((2 * C,), jnp.bfloat16), r(C, C),
              jnp.zeros((C,), jnp.bfloat16),
              jnp.asarray(rng.normal(size=(nH, 64, 64)).astype(np.float32)))
        for shift in (0, win // 2):
            def call(z, ws, shift=shift):
                mod, ln_s, ln_b, wq, bq, wkv, bkv, wo, bo, bias = ws
                return fused_attention_image(
                    z, mod, ln_s, ln_b, wq, bq, wkv, bkv, wo, bo, bias,
                    win=win, shift=shift, scale=D ** -0.5, num_heads=nH,
                    has_ln=True, residual=True)
            out.append((f"attnimg {name} s{shift}",
                        _time_compile(call, x, ws)))
            print(ROWFMT.format(*out[-1]), flush=True)
    return out


def rows_leff(B):
    import jax.numpy as jnp

    from uformer_tpu.ops.pallas.leff import fused_leff

    out = []
    for name, reso, C, nH, _depth in STAGES:
        Ch = 4 * C
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.normal(size=(B, reso, reso, C)).astype(np.float32) * 0.3,
            jnp.bfloat16)
        r = lambda *s: jnp.asarray(  # noqa: E731
            rng.normal(size=s).astype(np.float32) * 0.05, jnp.bfloat16)
        ws = (r(C, Ch), jnp.zeros((Ch,), jnp.bfloat16), r(3, 3, Ch),
              jnp.zeros((Ch,), jnp.bfloat16), r(Ch, C),
              jnp.zeros((C,), jnp.bfloat16), jnp.ones((C,), jnp.float32),
              jnp.zeros((C,), jnp.float32))

        def call(z, ws):
            w1, b1, wd, bd, w2, b2, ln_s, ln_b = ws
            return fused_leff(z, w1, b1, wd, bd, w2, b2, ln_s=ln_s,
                              ln_b=ln_b, residual=True)
        out.append((f"leff {name}", _time_compile(call, x, ws)))
        print(ROWFMT.format(*out[-1]), flush=True)
    return out


def rows_stage(B):
    import jax.numpy as jnp

    from uformer_tpu.ops.pallas.stage import fused_stage

    t256 = os.environ.get("UFORMER_TPU_MEGA_T256", "0") == "1"
    out = []
    for name, reso, C, nH, depth in STAGES:
        Ch = 4 * C
        T = (reso // 8) ** 2 if reso % 8 == 0 else 0
        if C % 128 or reso < 8 or T == 0 or (T > 64 and not t256):
            continue
        il = 2 if (B % 2 == 0 and C <= 256 and T == 64) else 1
        img = reso * reso * C * 2
        fixed = (nH * T * 4096 * (2 if T % 2 == 0 else 1) * 2
                 + il * (reso + 2) * (reso + 2) * Ch * 2 + 4 * il * img)
        bc = B
        while bc > 1 and (B % bc or bc % il or bc * img > 24 * 2**20
                          or fixed + bc * img > 64 * 2**20):
            bc -= 1
        if max(bc * reso * reso * C,
               (reso + 2) * (reso + 2) * Ch) * 2 > 24 * 2**20:
            continue
        n = depth
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.normal(size=(bc, reso, reso, C)).astype(np.float32) * 0.3,
            jnp.bfloat16)
        r = lambda *s: jnp.asarray(  # noqa: E731
            rng.normal(size=s).astype(np.float32) * 0.05, jnp.bfloat16)
        p = dict(
            ln1_s=jnp.ones((n, C), jnp.float32),
            ln1_b=jnp.zeros((n, C), jnp.float32),
            wq=r(n, C, C), bq=r(n, C), wk=r(n, C, C), bk=r(n, C),
            wv=r(n, C, C), bv=r(n, C), wo=r(n, C, C), bo=r(n, C),
            bias=jnp.asarray(rng.normal(size=(n, nH, 64, 64))
                             .astype(np.float32)),
            mod=r(n, 64, C),
            ln2_s=jnp.ones((n, C), jnp.float32),
            ln2_b=jnp.zeros((n, C), jnp.float32),
            w1=r(n, C, Ch), b1=r(n, Ch), wd=r(n, 3, 3, Ch), bd=r(n, Ch),
            w2=r(n, Ch, C), b2=r(n, C))

        def call(z, p, reso=reso, nH=nH, C=C):
            return fused_stage(z, p, scale=(C // nH) ** -0.5,
                               num_heads=nH, use_shift=reso > 8,
                               has_mod=True, parts="both")
        out.append((f"stage {name} x{depth}", _time_compile(call, x, p)))
        print(ROWFMT.format(*out[-1]), flush=True)
    return out


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--kernel", default="all",
                    choices=["all", "attnimg", "leff", "stage"])
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      tempfile.mkdtemp(prefix="ucc_xla_"))
    print(f"backend={jax.default_backend()} batch={args.batch}", flush=True)

    rows = []
    if args.kernel in ("all", "stage"):
        rows += rows_stage(args.batch)
    if args.kernel in ("all", "attnimg"):
        rows += rows_attn_image(args.batch)
    if args.kernel in ("all", "leff"):
        rows += rows_leff(args.batch)
    total = sum(t for _, t in rows)
    print(f"\nsum of per-variant compile times: {total:.1f} s "
          f"({len(rows)} variants)", flush=True)


if __name__ == "__main__":
    main()
