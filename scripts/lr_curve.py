#!/usr/bin/env python3
"""LR-schedule demo (reference `warmup_scheduler/run.py`): prints the
per-epoch learning rate of the warmup+cosine and StepLR schedules."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--nepoch", type=int, default=250)
    p.add_argument("--warmup_epochs", type=int, default=3)
    p.add_argument("--epochs_to_show", type=int, default=20)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # scalar math; avoid the TPU tunnel

    from uformer_tpu.train.schedules import (
        step_lr_schedule, warmup_cosine_schedule)

    spe = 1
    wc = warmup_cosine_schedule(args.lr, args.nepoch, spe, args.warmup_epochs)
    sl = step_lr_schedule(args.lr, spe)
    print(f"{'epoch':>6} {'warmup+cosine':>14} {'StepLR(50,.5)':>14}")
    shown = list(range(1, args.epochs_to_show + 1)) + \
        [50, 100, 150, 200, args.nepoch]
    for e in shown:
        if e > args.nepoch:
            continue
        print(f"{e:>6} {float(wc(e - 1)):>14.6e} {float(sl(e - 1)):>14.6e}")


if __name__ == "__main__":
    main()
