#!/usr/bin/env python3
"""SIDD training-patch generator CLI (reference `generate_patches_SIDD.py`)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src_dir", default="../SIDD_Medium_Srgb/Data")
    p.add_argument("--tar_dir", default="../datasets/denoising/sidd/train")
    p.add_argument("--ps", type=int, default=256)
    p.add_argument("--num_patches", type=int, default=300)
    p.add_argument("--num_cores", type=int, default=10)
    args = p.parse_args()

    from uformer_tpu.data.patches import generate_patches_sidd

    n = generate_patches_sidd(args.src_dir, args.tar_dir, args.ps,
                              args.num_patches, args.num_cores)
    print(f"wrote {n} patch pairs to {args.tar_dir}")


if __name__ == "__main__":
    main()
