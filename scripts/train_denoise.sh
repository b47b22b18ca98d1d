#!/bin/bash
# Canonical SIDD denoising recipe (reference script/train_denoise.sh:1-3)
python3 scripts/train.py --arch Uformer_B --batch_size 32 --gpu '' \
    --train_ps 128 --train_dir ./datasets/SIDD/train --env 32_0705_1 \
    --val_dir ./datasets/SIDD/val --embed_dim 32 --warmup --mode denoising
