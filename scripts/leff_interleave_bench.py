#!/usr/bin/env python3
"""Bisect the in-step LeFF-bwd slowdown: grad of ONE BasicLayer stage at
the enc3 train geometry (32, 16, 16, 256, depth 8), where the train-step
profile shows fused_leff_bwd at ~5.1 ms/block vs 0.4 ms standalone.
Variants toggle deterministic / drop_path / attention interleaving."""

import collections
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def profile_instances(fn, args, iters=4, match="fused_"):
    out = fn(*args)
    jax.block_until_ready(out)
    d = tempfile.mkdtemp(prefix="ileave_")
    try:
        jax.profiler.start_trace(d)
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        paths = sorted(glob.glob(f"{d}/plugins/profile/*/*.trace.json.gz"))
        with gzip.open(paths[-1]) as f:
            trace = json.load(f)
        pids = {e["pid"]: e["args"].get("name", "")
                for e in trace["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        dev = {p for p, n in pids.items()
               if "TPU" in n or "device" in n.lower()}
        per = collections.defaultdict(float)
        tot = 0.0
        for e in trace["traceEvents"]:
            if e.get("ph") == "X" and e.get("pid") in dev:
                name = e.get("name", "")
                if name.startswith("jit_") or not name or name[0].isdigit():
                    continue
                per[name] += e.get("dur", 0) / 1e3
                tot += e.get("dur", 0) / 1e3
        rows = {n: t / iters for n, t in per.items() if match in n}
        fam = collections.defaultdict(float)
        import re
        for n, t in rows.items():
            fam[re.sub(r"[.\d]+$", "", n)] += t
        return tot / iters, dict(fam), rows
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    from uformer_tpu.models.layers import BasicLayer
    from uformer_tpu.utils import init_params_fast

    B, H, C, depth, nH = 32, 16, 256, 8, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, H, C)), jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    for name, det, dpr in [
        ("train-like (det=False, dpr=0.1)", False, 0.1),
        ("det=False, dpr=0", False, 0.0),
        ("det=True", True, 0.0),
    ]:
        layer = BasicLayer(dim=C, depth=depth, num_heads=nH, win_size=8,
                           resolution=H, drop_path=(dpr,) * depth,
                           modulator=True, dtype=jnp.bfloat16)
        params = init_params_fast(layer, x)

        def loss(p, key):
            y = layer.apply(p, x, None, det,
                            rngs={"dropout": key} if not det else {})
            return jnp.sum(y.astype(jnp.float32)) * 1e-6

        g = jax.jit(jax.grad(loss))
        tot, fam, rows = profile_instances(g, (params, key))
        print(f"== {name}: device {tot:.2f} ms/step")
        for k, v in sorted(fam.items(), key=lambda kv: -kv[1]):
            print(f"   {k:<34} {v:8.3f}")
        worst = sorted(((t, n) for n, t in rows.items()
                        if "leff_bwd" in n), reverse=True)[:3]
        for t, n in worst:
            print(f"   worst {n}: {t:.3f}")


if __name__ == "__main__":
    main()


def multi_geometry():
    """All 9 train-stage geometries as independent BasicLayers (no convs
    between) — full attention+LeFF interleave, summed loss, one grad."""
    from uformer_tpu.models.layers import BasicLayer
    from uformer_tpu.utils import init_params_fast

    B = 32
    geoms = [(128, 32, 1, 1), (64, 64, 2, 2), (32, 128, 8, 4),
             (16, 256, 8, 8), (8, 512, 2, 16), (16, 512, 8, 16),
             (32, 256, 8, 8), (64, 128, 2, 4), (128, 64, 1, 2)]
    rng = np.random.default_rng(0)
    layers, ps, xs = [], [], []
    for (H, C, d, nH) in geoms:
        layer = BasicLayer(dim=C, depth=d, num_heads=nH, win_size=8,
                           resolution=H, drop_path=(0.1,) * d,
                           modulator=True, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((B, H, H, C)), jnp.bfloat16)
        layers.append(layer)
        xs.append(x)
        ps.append(init_params_fast(layer, x))

    def loss(params, key):
        tot = jnp.zeros((), jnp.float32)
        for layer, p, x in zip(layers, params, xs):
            y = layer.apply(p, x, None, False, rngs={"dropout": key})
            tot += jnp.sum(y.astype(jnp.float32)) * 1e-6
        return tot

    g = jax.jit(jax.grad(loss))
    key = jax.random.PRNGKey(0)
    tot, fam, rows = profile_instances(g, (ps, key))
    print(f"== multi-geometry 9-stage interleave: device {tot:.2f} ms/step")
    for k, v in sorted(fam.items(), key=lambda kv: -kv[1]):
        print(f"   {k:<34} {v:8.3f}")
    worst = sorted(((t, n) for n, t in rows.items()
                    if "leff_bwd" in n), reverse=True)[:5]
    for t, n in worst:
        print(f"   worst {n}: {t:.3f}")


if __name__ == "__main__" and os.environ.get("MULTI"):
    multi_geometry()


def encoder_chain():
    """Encoder-like chain: BasicLayer stages linked by real Downsample
    convs (the remaining delta vs multi_geometry, which was fast)."""
    from uformer_tpu.models.layers import BasicLayer, Downsample
    import flax.linen as nn
    from uformer_tpu.utils import init_params_fast

    B = 32
    geoms = [(128, 32, 1, 1), (64, 64, 2, 2), (32, 128, 8, 4),
             (16, 256, 8, 8), (8, 512, 2, 16)]

    class Enc(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=False):
            for i, (H, C, d, nH) in enumerate(geoms):
                x = BasicLayer(dim=C, depth=d, num_heads=nH, win_size=8,
                               resolution=H, drop_path=(0.1,) * d,
                               modulator=True, dtype=jnp.bfloat16,
                               name=f"s{i}")(
                    x, None, deterministic)
                if i < len(geoms) - 1:
                    x = Downsample(out_dim=2 * C, dtype=jnp.bfloat16,
                                   name=f"d{i}")(x)
            return x

    model = Enc()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 128, 128, 32)), jnp.bfloat16)
    params = init_params_fast(model, x)

    def loss(p, key):
        y = model.apply(p, x, False, rngs={"dropout": key})
        return jnp.sum(y.astype(jnp.float32)) * 1e-6

    g = jax.jit(jax.grad(loss))
    tot, fam, rows = profile_instances(g, (params, jax.random.PRNGKey(0)))
    print(f"== encoder chain (stages + Downsample convs): "
          f"device {tot:.2f} ms/step")
    for k, v in sorted(fam.items(), key=lambda kv: -kv[1]):
        print(f"   {k:<34} {v:8.3f}")
    worst = sorted(((t, n) for n, t in rows.items()
                    if "leff_bwd" in n), reverse=True)[:5]
    for t, n in worst:
        print(f"   worst {n}: {t:.3f}")


def mini_u():
    """Real Uformer U-topology (skips, up/downsample, in/out proj) but
    depths all-1: 9 LeFF blocks. Distinguishes topology (skip concats)
    from program size as the full-step slowdown trigger."""
    from uformer_tpu.models.uformer import Uformer
    from uformer_tpu.utils import init_params_fast

    model = Uformer(img_size=128, embed_dim=32, depths=(1,) * 9,
                    num_heads=(1, 2, 4, 8, 16, 16, 8, 4, 2),
                    modulator=True, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (32, 128, 128, 3)), jnp.float32)
    params = init_params_fast(model, x)

    def loss(p, key):
        y = model.apply(p, x, deterministic=False, rngs={"dropout": key})
        return jnp.sum(y.astype(jnp.float32)) * 1e-6

    g = jax.jit(jax.grad(loss))
    tot, fam, rows = profile_instances(g, (params, jax.random.PRNGKey(0)))
    print(f"== mini-U (full topology, depths all-1): "
          f"device {tot:.2f} ms/step")
    for k, v in sorted(fam.items(), key=lambda kv: -kv[1]):
        print(f"   {k:<34} {v:8.3f}")
    for t, n in sorted(((t, n) for n, t in rows.items()
                        if "leff_bwd" in n), reverse=True):
        print(f"   {n}: {t:.3f}")


def mini_u_variants():
    """Isolate the mini-U slowdown: (A) replace the skip concat with
    tile+add (no concatenate op, encoder stays live); (B) keep the concat
    but against a fresh constant (skip live range dies)."""
    import flax.linen as nn
    from uformer_tpu.models.layers import (
        BasicLayer, Downsample, InputProj, OutputProj, Upsample)
    from uformer_tpu.utils import init_params_fast

    class MiniU(nn.Module):
        mode: str = "concat"

        @nn.compact
        def __call__(self, x, deterministic=False):
            E = 32
            heads = (1, 2, 4, 8, 16, 16, 8, 4, 2)
            mode = self.mode

            def stage(name, dim, nH, reso, mod=False, dpr=0.1):
                if mode == "dpr0" and name == "enc0":
                    dpr = 0.0  # the real schedule's first block
                return BasicLayer(dim=dim, depth=1, num_heads=nH,
                                  win_size=8, resolution=reso,
                                  drop_path=(dpr,), modulator=mod,
                                  dtype=jnp.bfloat16, name=name)

            y = InputProj(out_dim=E, dtype=jnp.bfloat16,
                          name="input_proj")(x.astype(jnp.bfloat16))
            skips = []
            for k in range(4):
                y = stage(f"enc{k}", E * 2**k, heads[k], 128 // 2**k)(
                    y, None, deterministic)
                skips.append(y)
                y = Downsample(E * 2 ** (k + 1), dtype=jnp.bfloat16,
                               name=f"down{k}")(y)
            y = stage("conv", E * 16, heads[4], 8)(y, None, deterministic)
            for k in range(4):
                up = Upsample(E * 2 ** (3 - k), dtype=jnp.bfloat16,
                              name=f"up{k}")(y)
                s = skips[3 - k]
                if self.mode in ("concat", "dpr0", "realtail"):
                    y = jnp.concatenate([up, s], axis=-1)
                elif self.mode == "padadd":
                    C = up.shape[-1]
                    y = jnp.pad(up, ((0, 0),) * 3 + ((0, C),)) \
                        + jnp.pad(s, ((0, 0),) * 3 + ((C, 0),))
                elif self.mode == "stopgrad":
                    y = jnp.concatenate(
                        [up, jax.lax.stop_gradient(s)], axis=-1) \
                        + 0.001 * jnp.tile(s, (1, 1, 1, 2))
                elif self.mode == "tile":
                    y = jnp.tile(up, (1, 1, 1, 2)) \
                        + 0.001 * jnp.tile(s, (1, 1, 1, 2))
                elif self.mode == "fresh":
                    y = jnp.concatenate(
                        [up, jnp.zeros_like(up) + jnp.float32(0.1)
                         .astype(up.dtype)], axis=-1) \
                        + 0.0 * jnp.tile(s, (1, 1, 1, 2)).astype(up.dtype)
                y = stage(f"dec{k}", E * 2 ** (4 - k), heads[5 + k],
                          128 // 2 ** (3 - k), mod=True)(
                    y, None, deterministic)
            y = OutputProj(out_dim=3, dtype=jnp.bfloat16,
                           name="out")(y)
            if mode == "realtail":
                return x.astype(jnp.float32) + y.astype(jnp.float32)
            return y

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (32, 128, 128, 3)), jnp.float32)
    for mode in (os.environ.get("MODES") or "tile,fresh").split(","):
        model = MiniU(mode=mode)
        params = init_params_fast(model, x)

        def loss(p, key):
            y = model.apply(p, x, False, rngs={"dropout": key})
            return jnp.sum(y.astype(jnp.float32)) * 1e-6

        g = jax.jit(jax.grad(loss))
        tot, fam, rows = profile_instances(g, (params,
                                               jax.random.PRNGKey(0)))
        print(f"== mini-U mode={mode}: device {tot:.2f} ms/step")
        for k, v in sorted(fam.items(), key=lambda kv: -kv[1]):
            print(f"   {k:<34} {v:8.3f}")
        for t, n in sorted(((t, n) for n, t in rows.items()
                            if "leff_bwd" in n), reverse=True)[:5]:
            print(f"   {n}: {t:.3f}")
