#!/usr/bin/env python3
"""Bisect the full-train-step custom-call slowdown: the same Pallas
kernels run ~3-13x slower inside the full train step (profile_train_ops)
than in single-stage or leff-only-chain repros. Variants peel the step
apart: full model grad (no optimizer), +optimizer, encoder-only, etc."""

import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def prof(fn, args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    # real fetch to be sure the warmup completed (block_until_ready lies
    # on the axon tunnel)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    d = tempfile.mkdtemp(prefix="bisect_")
    try:
        jax.profiler.start_trace(d)
        for _ in range(iters):
            out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        jax.profiler.stop_trace()
        paths = sorted(glob.glob(f"{d}/plugins/profile/*/*.trace.json.gz"))
        with gzip.open(paths[-1]) as f:
            trace = json.load(f)
        pids = {e["pid"]: e["args"].get("name", "")
                for e in trace["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        dev = {p for p, n in pids.items()
               if "TPU" in n or "device" in n.lower()}
        fam = collections.defaultdict(float)
        tot = 0.0
        for e in trace["traceEvents"]:
            if e.get("ph") == "X" and e.get("pid") in dev:
                name = e.get("name", "")
                if name.startswith("jit_") or not name or name[0].isdigit():
                    continue
                fam[re.sub(r"[.\d]+$", "", name)] += e.get("dur", 0) / 1e3
                tot += e.get("dur", 0) / 1e3
        return tot / iters, {k: v / iters for k, v in fam.items()}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def show(name, tot, fam, top=8):
    print(f"== {name}: device {tot:.2f} ms/step")
    for k, v in sorted(fam.items(), key=lambda kv: -kv[1])[:top]:
        print(f"   {k:<36} {v:8.3f}")
    sys.stdout.flush()


def main():
    from uformer_tpu import get_arch
    from uformer_tpu.train.losses import charbonnier_loss
    from uformer_tpu.utils import init_params_fast

    B, ps = 32, 128
    model = get_arch({"arch": "Uformer_B", "train_ps": ps,
                      "dtype": jnp.bfloat16})
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, ps, ps, 3)), jnp.float32)
    t = jnp.asarray(rng.uniform(0, 1, (B, ps, ps, 3)), jnp.float32)
    params = init_params_fast(model, x)
    key = jax.random.PRNGKey(0)

    which = os.environ.get("VARIANTS", "grad_det,grad_train").split(",")

    if "fwd" in which:
        f = jax.jit(lambda p: model.apply(p, x))
        show("fwd only (det)", *prof(f, (params,)))

    if "grad_det" in which:
        def loss_det(p):
            return charbonnier_loss(model.apply(p, x), t)
        g = jax.jit(jax.grad(loss_det))
        show("grad, deterministic (no dropout rng)", *prof(g, (params,)))

    if "grad_train" in which:
        def loss_tr(p, k):
            return charbonnier_loss(
                model.apply(p, x, deterministic=False,
                            rngs={"dropout": k}), t)
        g2 = jax.jit(jax.grad(loss_tr))
        show("grad, train mode (DropPath rng)", *prof(g2, (params, key)))


if __name__ == "__main__":
    main()
