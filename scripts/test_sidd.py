#!/usr/bin/env python3
"""SIDD validation eval (reference `test/test_sidd.py`): restore the 40x32
noisy blocks, write Idenoised.mat + optional PNGs, score with the official
protocol when GT is present."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._common import build_restorer, eval_argparser


def main():
    args = eval_argparser("SIDD denoising eval").parse_args()
    fn = build_restorer(args)

    from uformer_tpu.eval.sidd import run_sidd_eval

    run_sidd_eval(fn, args.input_dir, args.result_dir)


if __name__ == "__main__":
    main()
