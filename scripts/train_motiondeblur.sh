#!/bin/bash
# Canonical GoPro deblurring recipe (reference script/train_motiondeblur.sh:1-3)
python3 scripts/train.py --arch Uformer_B --batch_size 8 --gpu '' \
    --train_ps 256 --train_dir ./datasets/GoPro/train --env _0706_1 \
    --val_dir ./datasets/GoPro/val --embed_dim 32 --nepoch 3000 \
    --checkpoint 500 --dataset GoPro --warmup --mode deblurring
