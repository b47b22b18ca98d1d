"""Per-stage kernel microbenchmark: fused attention + fused LeFF at every
Uformer_B@256 stage geometry, reporting achieved vs MXU-floor time.

Timing: the kernel is iterated on-device under a jitted lax.fori_loop
(one dispatch per measurement — the axon tunnel's per-call dispatch noise
swamps sub-ms kernels otherwise); a 1-iteration loop calibrates the
constant dispatch+fetch overhead. Weights are loop-carried jit arguments,
not closure constants (Mosaic's scoped-vmem accounting differs for
constant operands).

Usage: python scripts/kernel_bench.py [--batch 8] [--kernel attn|leff|all]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, reso, C, heads, depth) for Uformer_B @ 256
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

# bf16 MXU peak per chip by TPU generation; fallback 197e12 (v5e).
_PEAKS = {"v4": 275e12, "v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12,
          "v6 lite": 918e12, "v6e": 918e12}


def _detect_peak():
    try:
        import jax
        kind = jax.devices()[0].device_kind.lower()
        for name, p in _PEAKS.items():
            if name in kind:
                return p
    except Exception:
        pass
    return 197e12


PEAK = _detect_peak()
ROWFMT = "{0:<16} {1:8.3f} {2:>5} {3:8.3f} {4:8.2f}"
ITERS = 30


def measure(call, z, ws):
    """Per-iteration DEVICE seconds of z -> call(z, ws): the kernel is
    looped on-device under one dispatch and its device time read from a
    profiler trace (host-side wall clocks are useless at sub-ms scale on
    the tunneled TPU)."""
    import shutil
    import tempfile

    import jax
    from jax.lax import fori_loop

    from uformer_tpu.utils.debug import summarize_trace

    @functools_partial_jit
    def loop(z, ws, n):
        return fori_loop(0, n, lambda i, a: call(a, ws), z)

    def run(n):
        out = loop(z, ws, n)
        _ = float(np.asarray(jax.device_get(out)).ravel()[0])

    run(ITERS)  # compile
    d = tempfile.mkdtemp(prefix="kbench_")
    try:
        jax.profiler.start_trace(d)
        run(ITERS)
        jax.profiler.stop_trace()
        groups = summarize_trace(d, top=50)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    dev_ms = sum(v for k, v in groups.items() if "fused" in k)
    if dev_ms == 0:
        dev_ms = sum(groups.values())
    return dev_ms / 1e3 / ITERS


def functools_partial_jit(f):
    import jax

    return jax.jit(f, static_argnums=2)


def bench_attn_image(B):
    """Image-layout sub-block kernel (the path the model actually runs for
    C % 128 == 0 stages): includes LN + shift + partition + residual."""
    import jax.numpy as jnp

    from uformer_tpu.ops.pallas.attention_image import fused_attention_image

    win = 8
    rows = []
    for name, reso, C, nH, depth in STAGES:
        if C % 128 and (128 % C or C < 32):
            continue
        packed = bool(C % 128)  # pixel-packed narrow-C variant
        D = C // nH
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, reso, reso, C)).astype(np.float32)
                        * 0.3, jnp.bfloat16)
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
            t = measure(call, x, ws)
            flops = B * reso * reso * (8 * C * C + 4 * 128 * C)
            floor = flops / PEAK
            tag = "attnimg-pk" if packed else "attnimg"
            row = (f"{tag} {name} s{shift}", t * 1e3, depth,
                   floor * 1e3, t / floor)
            print(ROWFMT.format(*row), flush=True)
            rows.append(row)
    return rows


def bench_attn(B):
    import jax.numpy as jnp

    from uformer_tpu.ops.pallas.attention_block import fused_attention_block

    win, N = 8, 64
    rows = []
    for name, reso, C, nH, depth in STAGES:
        Bw = B * (reso // win) ** 2
        D = C // nH
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(Bw, N, C)).astype(np.float32),
                        jnp.bfloat16)
        r = lambda *s: jnp.asarray(  # noqa: E731
            rng.normal(size=s).astype(np.float32) * 0.05, jnp.bfloat16)
        ws = (r(N, C), r(C, C), jnp.zeros((C,), jnp.bfloat16),
              r(C, 2 * C), jnp.zeros((2 * C,), jnp.bfloat16),
              r(C, C), jnp.zeros((C,), jnp.bfloat16),
              jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32)))
        # mirror the model: LN not folded (defer_ln1 False); modulator on
        # decoder stages only
        use_mod = name.startswith("dec")
        for shift in (0, win // 2):
            def call(z, ws, shift=shift):
                mod, wq, bq, wkv, bkv, wo, bo, bias = ws
                return fused_attention_block(
                    z, mod if use_mod else None, None, None, wq, bq, wkv,
                    bkv, wo, bo, bias, win=win, shift=shift, H=reso,
                    W=reso, scale=D ** -0.5, num_heads=nH, has_ln=False)
            t = measure(call, x, ws)
            flops = Bw * N * (8 * C * C + 4 * 128 * C)
            floor = flops / PEAK
            row = (f"attn {name} s{shift}", t * 1e3, depth,
                   floor * 1e3, t / floor)
            print(ROWFMT.format(*row), flush=True)
            rows.append(row)
    return rows


def bench_leff(B):
    import jax.numpy as jnp

    from uformer_tpu.ops.pallas.leff import fused_leff

    rows = []
    for name, reso, C, nH, depth in STAGES:
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
        t = measure(call, x, ws)
        flops = B * reso * reso * (16 * C * C + 2 * 9 * Ch)
        floor = flops / PEAK
        row = (f"leff {name}", t * 1e3, depth, floor * 1e3, t / floor)
        print(ROWFMT.format(*row), flush=True)
        rows.append(row)
    return rows


def bench_stage(B):
    """The whole-stage megakernel at the geometries the model routes to it
    at 256^2/bf16 (enc2/enc3/conv/dec0/dec1): all `depth` blocks in one
    kernel. `model-ms` is the whole-stage time (depth folded in), so these
    rows sum directly against bench.py's fused_stage breakdown entry."""
    import jax.numpy as jnp

    from uformer_tpu.ops.pallas.stage import fused_stage

    t256 = os.environ.get("UFORMER_TPU_MEGA_T256", "1") == "1"
    rows = []
    for name, reso, C, nH, depth in STAGES:
        itemsize = 2
        Ch = 4 * C
        T = (reso // 8) ** 2 if reso % 8 == 0 else 0
        if C % 128 or reso < 8 or T == 0 or (T > 64 and not t256):
            continue
        # batch chunk that fits the model's VMEM budget (mirrors
        # BasicLayer: 24 MB image cap + 64 MB co-residency total); the
        # validated stages keep bc == B, dec2@128² runs chunks of 2 and
        # the row reports the model-total time (t * B/bc)
        il = 2 if (B % 2 == 0 and C <= 256 and T == 64) else 1
        gpar = 2 if T % 2 == 0 else 1
        img = reso * reso * C * itemsize
        fixed = (nH * T * 4096 * gpar * itemsize
                 + il * (reso + 2) * (reso + 2) * Ch * itemsize
                 + 4 * il * img)
        bc = B
        while bc > 1 and (B % bc or bc % il or bc * img > 24 * 2**20
                          or fixed + bc * img > 64 * 2**20):
            bc -= 1
        if (max(bc * reso * reso * C,
                (reso + 2) * (reso + 2) * Ch) * itemsize > 24 * 2**20):
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

        for parts in ("both", "attn", "leff", "leff-dwbf16"):
            dwb = parts == "leff-dwbf16"

            def call(z, p, reso=reso, nH=nH, C=C, parts=parts, dwb=dwb):
                return fused_stage(z, p, scale=(C // nH) ** -0.5,
                                   num_heads=nH, use_shift=reso > 8,
                                   has_mod=True,
                                   parts="leff" if dwb else parts,
                                   dw_bf16=dwb)
            t = measure(call, x, p) * (B // bc)
            part_flops = {
                "attn": 8 * C * C + 4 * 128 * C,
                "leff": 16 * C * C + 18 * Ch,
                "leff-dwbf16": 16 * C * C + 18 * Ch,
            }
            f = (part_flops["attn"] + part_flops["leff"]
                 if parts == "both" else part_flops[parts])
            flops = depth * B * reso * reso * f
            floor = flops / PEAK
            row = (f"stage {name} x{depth} {parts}", t * 1e3, 1,
                   floor * 1e3, t / floor)
            print(ROWFMT.format(*row), flush=True)
            if parts == "both":
                rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--kernel",
                    choices=["attn", "attnimg", "leff", "stage", "all"],
                    default="all")
    args = ap.parse_args()

    rows = []
    if args.kernel in ("leff", "all"):
        rows += bench_leff(args.batch)
    if args.kernel in ("attnimg", "all"):
        rows += bench_attn_image(args.batch)
    if args.kernel in ("attn", "all"):
        rows += bench_attn(args.batch)
    if args.kernel in ("stage", "all"):
        rows += bench_stage(args.batch)

    print(f"\n{'kernel':<16} {'ms':>8} {'xdep':>5} {'floor':>8} "
          f"{'x-floor':>8} {'model-ms':>9}")
    tot = 0.0
    for name, ms, depth, floor, ratio in rows:
        # shifted/unshifted each run ~depth/2 times per forward
        mult = depth / 2 if "attn" in name else depth
        tot += ms * mult
        print(f"{name:<16} {ms:8.3f} {depth:>5} {floor:8.3f} {ratio:8.2f} "
              f"{ms * mult:9.2f}")
    print(f"total modelled kernel ms/iter: {tot:.1f}")


if __name__ == "__main__":
    main()
