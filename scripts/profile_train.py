#!/usr/bin/env python3
"""Whole-train-step per-op-family device-time table (ms/step) from a
profiler trace — the training-side twin of bench.py's inference
breakdown (reference hot loop: train/train_denoise.py:180-184)."""

import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ps", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--top", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from uformer_tpu import get_arch
    from uformer_tpu.train.schedules import warmup_cosine_schedule
    from uformer_tpu.train.train_step import (
        TrainState, make_optimizer, make_train_step)
    from uformer_tpu.utils import init_params_fast
    from uformer_tpu.utils.debug import summarize_trace

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = get_arch({"arch": "Uformer_B", "train_ps": args.ps,
                      "dtype": dtype})
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (args.batch, args.ps, args.ps, 3))
                    .astype(np.float32))
    params = init_params_fast(model, x)
    tx = make_optimizer(warmup_cosine_schedule(2e-4, 250, 1000, 3))
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, mixup_after_epoch=5,
                                   steps_per_epoch=1000), donate_argnums=0)
    key = jax.random.PRNGKey(0)
    batch = {"input": x, "target": x}
    state, loss = step(state, batch, key)
    _ = float(loss)

    d = tempfile.mkdtemp(prefix="utrain_")
    try:
        jax.profiler.start_trace(d)
        for _ in range(args.iters):
            state, loss = step(state, batch, key)
        _ = float(loss)
        jax.profiler.stop_trace()
        groups = summarize_trace(d, top=100)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    tot = sum(groups.values()) / args.iters
    print(f"total device ms/step: {tot:.2f}")
    for k, v in sorted(groups.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {k:<40} {v / args.iters:8.3f}")


if __name__ == "__main__":
    main()
