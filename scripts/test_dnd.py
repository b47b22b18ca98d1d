#!/usr/bin/env python3
"""DND benchmark eval (reference `test/test_dnd.py`): restore each crop,
save PNG + per-crop .mat, bundle for server submission."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._common import build_restorer, eval_argparser


def main():
    args = eval_argparser("DND denoising eval").parse_args()
    fn = build_restorer(args)

    from uformer_tpu.eval.dnd import run_dnd_eval

    n = run_dnd_eval(fn, args.input_dir, args.result_dir,
                     save_images=args.save_images)
    print(f"restored {n} crops; bundled under {args.result_dir}/matfile/bundled")


if __name__ == "__main__":
    main()
