#!/usr/bin/env python3
"""Inventory the Pallas kernel variants the default flagship paths build.

Compile-cost diagnostic for the cold-compile problem (bench_infer
compile_s 201.3 s vs the <=60 s target): every distinct kernel-factory
invocation below becomes one Mosaic program XLA must compile. This
script TRACES (jax.eval_shape — no compile, no execution, runs on the
CPU host with the tunnel down) the exact workloads bench.py measures:

  * inference: Uformer_B 256² bs8, serving mode (deterministic)
  * training:  Uformer_B 128² bs32 value_and_grad train step
    (the reference recipe, /root/reference/script/train_denoise.sh:1-3)

and prints each kernel factory's distinct argument tuples, so "which
variant families dominate the compile" is a table instead of a guess.

`jax.default_backend` is monkeypatched to "tpu" so every route gate
(ops/attention.py:resolve_backend, models/layers.py route conditions)
picks the hardware path while tracing on CPU.
"""

from __future__ import annotations

import argparse
import collections
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("UFORMER_TPU_NO_CACHE", "1")

import jax
import jax.numpy as jnp
import numpy as np

# Force the CPU platform: this is a trace-only diagnostic and must work
# with the TPU tunnel down. The env-level JAX_PLATFORMS is NOT enough —
# the axon sitecustomize's register() overrides it with
# jax.config.update("jax_platforms", "axon,cpu") at interpreter startup,
# and the axon backend init then dials the (possibly dead) relay with no
# timeout. config.update AFTER import, BEFORE first backend use, wins.
jax.config.update("jax_platforms", "cpu")

jax.default_backend = lambda: "tpu"  # route gates only; nothing lowers

COUNTS: dict[str, collections.Counter] = collections.defaultdict(
    collections.Counter)


def _wrap(mod, name, argnames):
    fn = getattr(mod, name)
    tag = f"{mod.__name__.rsplit('.', 1)[1]}.{name}"

    @functools.wraps(fn)
    def wrapped(*args, **kw):
        parts = []
        for i, a in enumerate(args):
            an = argnames[i] if i < len(argnames) else str(i)
            parts.append(f"{an}={a}")
        parts += [f"{k}={v}" for k, v in sorted(kw.items())]
        COUNTS[tag][", ".join(parts)] += 1
        return fn(*args, **kw)

    setattr(mod, name, wrapped)


def instrument():
    import inspect

    from uformer_tpu.ops.pallas import (attention_block, attention_image,
                                        dwconv, leff, stage)

    targets = [
        (stage, "_make_stage_kernel"),
        (attention_image, "_make_kernel"),
        (attention_image, "_make_packed_kernel"),
        (attention_block, "_make_kernel"),
        (attention_block, "_make_packed_kernel"),
        (attention_block, "_make_bwd_kernel"),
        (attention_block, "_make_packed_bwd_kernel"),
        (leff, "_make_kernel"),
        (leff, "_make_smallimg_kernel"),
        (leff, "_make_bwd_kernel"),
        (leff, "_make_smallimg_bwd_kernel"),
        (dwconv, "_make_kernel"),
    ]
    for mod, name in targets:
        fn = getattr(mod, name)
        if hasattr(fn, "__wrapped__"):
            fn = fn.__wrapped__  # unwrap lru_cache to see every call site
        argnames = list(inspect.signature(fn).parameters)
        _wrap(mod, name, argnames)


def _shape_params(model, x, dtype):
    """Shape-only param tree (ShapeDtypeStructs) — tracing `apply` needs
    no concrete leaves, and materializing ~50M params on the 1-core host
    is the slow part this diagnostic doesn't need."""
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    return jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, dtype if jnp.issubdtype(s.dtype, jnp.floating)
            else s.dtype), shapes)


def trace_inference(batch=8, size=256):
    from uformer_tpu import get_arch

    dtype = jnp.bfloat16
    model = get_arch({"arch": "Uformer_B", "train_ps": size,
                      "dtype": dtype})
    x = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.float32)
    print("tracing init (shapes only)...", flush=True)
    params = _shape_params(model, x, dtype)
    print("tracing apply...", flush=True)
    jax.eval_shape(lambda p, v: jnp.clip(model.apply(p, v), 0., 1.),
                   params, x)


def trace_train(batch=32, size=128):
    from uformer_tpu import get_arch
    from uformer_tpu.train.losses import charbonnier_loss

    model = get_arch({"arch": "Uformer_B", "train_ps": size,
                      "dtype": jnp.bfloat16})
    x = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.float32)
    print("tracing init (shapes only)...", flush=True)
    params = _shape_params(model, x, jnp.float32)

    def loss_fn(p, noisy, clean):
        return charbonnier_loss(model.apply(p, noisy), clean)

    print("tracing value_and_grad...", flush=True)
    jax.eval_shape(lambda p, a, b: jax.value_and_grad(loss_fn)(p, a, b),
                   params, x, x)


def report(title):
    total = 0
    print(f"\n=== {title} ===")
    for tag in sorted(COUNTS):
        ctr = COUNTS[tag]
        print(f"\n{tag}: {len(ctr)} variant(s), {sum(ctr.values())} call(s)")
        for key, n in ctr.most_common():
            print(f"  x{n:<3} {key}")
        total += len(ctr)
    print(f"\nTOTAL distinct kernel variants: {total}")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["infer", "train", "both"],
                    default="both")
    args = ap.parse_args()
    instrument()
    if args.mode in ("infer", "both"):
        trace_inference()
        report("inference (Uformer_B 256² bs8 bf16, serving)")
    if args.mode in ("train", "both"):
        COUNTS.clear()
        trace_train()
        report("train step (Uformer_B 128² bs32, value_and_grad)")


if __name__ == "__main__":
    main()
