"""Shared CLI plumbing for the eval scripts (each reference test script
carries a duplicated argparse block, e.g. test_sidd.py:27-55; here it's
one module)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def eval_argparser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--input_dir", required=True)
    p.add_argument("--result_dir", default="./results")
    p.add_argument("--weights", required=True,
                   help=".pth (torch reference) or orbax checkpoint dir")
    p.add_argument("--arch", default="Uformer_B")
    p.add_argument("--embed_dim", type=int, default=32)
    p.add_argument("--dd_in", type=int, default=3)
    p.add_argument("--train_ps", type=int, default=128)
    p.add_argument("--win_size", type=int, default=8)
    p.add_argument("--token_projection", default="linear")
    p.add_argument("--token_mlp", default="leff")
    p.add_argument("--dtype", default="float32",
                   help="float32 for exact checkpoint-parity eval; bfloat16 "
                        "for fastest TPU inference")
    p.add_argument("--save_images", action="store_true")
    p.add_argument("--tile", type=int, default=0,
                   help="if >0, use overlapping-crop tiled inference with "
                        "this tile size")
    p.add_argument("--tile_overlap", type=int, default=32)
    p.add_argument("--tile_batch", type=int, default=8,
                   help="tile positions batched per device dispatch in "
                        "tiled inference")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="if >0, shard eval over this many devices on a "
                        "'data' mesh axis: the tile batch is restored in "
                        "parallel (requires --tile)")
    return p


def build_restorer(args):
    """Build the jitted NHWC [0,1]-clipped restorer from CLI args."""
    import jax
    import jax.numpy as jnp

    from uformer_tpu import get_arch
    from uformer_tpu.train.checkpoints import load_params

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if dtype == jnp.float32:
        # TPU fp32 matmuls default to single-pass bf16 (~4e-3 error) —
        # checkpoint-parity eval needs true fp32 accumulation.
        jax.config.update("jax_default_matmul_precision", "highest")
    model = get_arch({"arch": args.arch, "embed_dim": args.embed_dim,
                      "train_ps": args.train_ps, "dd_in": args.dd_in,
                      "dtype": dtype})
    params = jax.tree_util.tree_map(
        jnp.asarray, load_params(args.weights, args.arch))
    if dtype == jnp.bfloat16:
        # serving mode: pre-cast >=2-D weights once so the per-forward
        # f32->bf16 converts are no-ops (bit-identical outputs)
        from uformer_tpu.utils import cast_weights
        params = cast_weights(params, dtype)

    fwd = jax.jit(lambda p, x: jnp.clip(model.apply(p, x), 0.0, 1.0))

    def fn(x):
        return fwd(params, jnp.asarray(x, jnp.float32))

    if getattr(args, "mesh_data", 0):
        if not args.tile:
            raise SystemExit("--mesh_data requires --tile")
        import numpy as np

        from uformer_tpu.parallel import make_mesh
        from uformer_tpu.parallel.spatial import tiled_inference_sharded

        mesh = make_mesh(jax.devices()[:args.mesh_data])

        def sharded_fn(x):
            return tiled_inference_sharded(
                fn, np.asarray(x), mesh, tile=args.tile,
                overlap=args.tile_overlap)

        return sharded_fn

    if args.tile:
        from uformer_tpu.eval.padding import tiled_inference

        def tiled_fn(x):
            return tiled_inference(fn, x, tile=args.tile,
                                   overlap=args.tile_overlap,
                                   tile_batch=args.tile_batch)

        return tiled_fn
    return fn
