#!/usr/bin/env python3
"""Params/GFLOPs harness (reference `model.py:1331-1344` / README GMacs
section): builds Uformer16 @ 256² by default and prints parameter count
and compiler-measured GFLOPs."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="Uformer_T")
    p.add_argument("--embed_dim", type=int, default=16)
    p.add_argument("--input_size", type=int, default=256)
    args = p.parse_args()

    from uformer_tpu import get_arch
    from uformer_tpu.utils.flops import model_complexity

    model = get_arch({"arch": args.arch, "embed_dim": args.embed_dim,
                      "train_ps": args.input_size, "attn_backend": "jnp"})
    info = model_complexity(
        model, (1, args.input_size, args.input_size, 3))
    print(model)
    print("# model parameters: %.2f M" % info["params_m"])
    print("number of GFLOPs: %.2f G" % info["gflops"])
    print("bytes accessed: %.2f GB" % info["bytes_gb"])


if __name__ == "__main__":
    main()
