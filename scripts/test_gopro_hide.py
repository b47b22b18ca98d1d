#!/usr/bin/env python3
"""GoPro / HIDE deblurring eval (reference `test/test_gopro_hide.py`):
full-resolution restore + skimage-protocol PSNR/SSIM + psnr_ssim.txt."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._common import build_restorer, eval_argparser


def main():
    p = eval_argparser("GoPro/HIDE deblurring eval")
    p.add_argument("--square_pad", action="store_true",
                   help="reproduce the reference expand2square padding "
                        "exactly (slower; default pads per-side only)")
    args = p.parse_args()
    fn = build_restorer(args)

    from uformer_tpu.eval.gopro_hide import run_gopro_eval

    run_gopro_eval(fn, args.input_dir, args.result_dir,
                   save_images=args.save_images, square_pad=args.square_pad)


if __name__ == "__main__":
    main()
