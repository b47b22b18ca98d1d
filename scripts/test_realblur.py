#!/usr/bin/env python3
"""RealBlur-J/-R eval (reference `test/test_realblur.py`): restore each
blurred image from the list file, then ECC-aligned masked PSNR/SSIM
scoring in a process pool."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._common import build_restorer, eval_argparser


def main():
    p = eval_argparser("RealBlur deblurring eval")
    p.add_argument("--list_file", required=True,
                   help="RealBlur list file: lines of '<gt_rel> <blur_rel>'")
    p.add_argument("--workers", type=int, default=10)
    args = p.parse_args()
    fn = build_restorer(args)

    from uformer_tpu.eval.realblur import restore_realblur, score_realblur

    pairs = restore_realblur(fn, args.list_file, args.input_dir,
                             args.result_dir)
    psnr, ssim = score_realblur(pairs, workers=args.workers)
    print(f"RealBlur PSNR: {psnr:.4f} SSIM: {ssim:.4f}")
    with open(f"{args.result_dir}/psnr_ssim.txt", "a") as f:
        f.write(f"PSNR: {psnr:.4f} SSIM: {ssim:.4f}\n")


if __name__ == "__main__":
    main()
