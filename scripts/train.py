#!/usr/bin/env python3
"""Training CLI (reference `train/train_denoise.py` /
`train_motiondeblur.py` + `script/train_*.sh` launchers).

Denoise recipe:  --arch Uformer_B --batch_size 32 --train_ps 128 \
                 --mode denoising --warmup
Deblur recipe:   --arch Uformer_B --batch_size 8 --train_ps 256 \
                 --mode deblurring --nepoch 3000 --checkpoint 500 --warmup
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from uformer_tpu.config import add_options_to_parser, options_from_args

    parser = argparse.ArgumentParser(description="uformer_tpu trainer")
    add_options_to_parser(parser)
    opt = options_from_args(parser.parse_args())

    from uformer_tpu.train.trainer import Trainer

    trainer = Trainer(opt)
    state, best = trainer.fit()
    print(f"done; best PSNR {best:.4f}")


if __name__ == "__main__":
    main()
