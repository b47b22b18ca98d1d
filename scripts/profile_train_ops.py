#!/usr/bin/env python3
"""Per-op-instance device-time dump for the train step: every distinct op
name (e.g. fused_leff_bwd.123) with count and avg ms — correlates kernel
instances with stage geometries to find which of the 40 LeFF blocks eat
the step (the family table in profile_train.py hides the distribution)."""

import collections
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
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--match", default="fused_")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from uformer_tpu import get_arch
    from uformer_tpu.train.schedules import warmup_cosine_schedule
    from uformer_tpu.train.train_step import (
        TrainState, make_optimizer, make_train_step)
    from uformer_tpu.utils import init_params_fast

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

    d = tempfile.mkdtemp(prefix="trainops_")
    try:
        jax.profiler.start_trace(d)
        for _ in range(args.iters):
            state, loss = step(state, batch, key)
        jax.block_until_ready(loss)
        jax.profiler.stop_trace()

        import glob
        import gzip
        import json

        paths = sorted(glob.glob(
            f"{d}/plugins/profile/*/*.trace.json.gz"))
        with gzip.open(paths[-1]) as f:
            trace = json.load(f)
        pids = {e["pid"]: e["args"].get("name", "")
                for e in trace["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        dev = {p for p, n in pids.items()
               if "TPU" in n or "device" in n.lower()}
        per = collections.defaultdict(lambda: [0, 0.0])
        total = 0.0
        for e in trace["traceEvents"]:
            if e.get("ph") == "X" and e.get("pid") in dev:
                name = e.get("name", "")
                if name.startswith("jit_") or not name:
                    continue
                if name[0].isdigit():
                    continue
                per[name][0] += 1
                per[name][1] += e.get("dur", 0) / 1e3
                total += e.get("dur", 0) / 1e3
        print(f"total device ms/step: {total / args.iters:.2f}")
        rows = [(n, c, t) for n, (c, t) in per.items()
                if args.match in n]
        for n, c, t in sorted(rows, key=lambda r: -r[2]):
            print(f"{n:<44} n={c:>3} tot={t / args.iters:8.3f} "
                  f"avg={t / c:7.3f}")
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
