#!/bin/bash
# Eval one-liners (reference script/test.sh) — uncomment the one you need.

# SIDD
# python3 scripts/test_sidd.py --input_dir ./datasets/denoising/sidd/val \
#     --result_dir ./results/denoising/SIDD/ \
#     --weights ./logs/denoising/SIDD/Uformer_B/models/model_best.pth

# DND
# python3 scripts/test_dnd.py --input_dir ./datasets/denoising/dnd/input \
#     --result_dir ./results/denoising/DND/ \
#     --weights ./logs/denoising/SIDD/Uformer_B/models/model_best.pth

# GoPro
# python3 scripts/test_gopro_hide.py --input_dir ./datasets/deblurring/GoPro/test \
#     --result_dir ./results/deblurring/GoPro/ \
#     --weights ./logs/deblurring/GoPro/Uformer_B/models/model_best.pth

# HIDE
# python3 scripts/test_gopro_hide.py --input_dir ./datasets/deblurring/HIDE/test \
#     --result_dir ./results/deblurring/HIDE/ \
#     --weights ./logs/deblurring/GoPro/Uformer_B/models/model_best.pth

# RealBlur-J / RealBlur-R
# python3 scripts/test_realblur.py --input_dir ./datasets/deblurring/RealBlur \
#     --list_file ./datasets/deblurring/RealBlur_J_test_list.txt \
#     --result_dir ./results/deblurring/RealBlur_J/ \
#     --weights ./logs/deblurring/GoPro/Uformer_B/models/model_best.pth
