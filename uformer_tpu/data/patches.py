"""SIDD patch generation (reference `/root/reference/generate_patches_SIDD.py`).

Scans SIDD-Medium scene directories for GT/NOISY PNG pairs and writes
`num_patches` random `ps`x`ps` crops per image to
<tar>/groundtruth and <tar>/input, parallelized over processes.
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import ProcessPoolExecutor
from glob import glob

import numpy as np


def _save_patches(args):
    (i, gt_path, noisy_path, gt_dir, input_dir, ps, num_patches, seed) = args
    import cv2

    gt = cv2.imread(gt_path)
    noisy = cv2.imread(noisy_path)
    H, W = gt.shape[:2]
    rng = np.random.default_rng(seed + i)
    for j in range(num_patches):
        rr = int(rng.integers(0, H - ps + 1))
        cc = int(rng.integers(0, W - ps + 1))
        cv2.imwrite(os.path.join(gt_dir, f"{i+1}_{j+1}.png"),
                    gt[rr:rr + ps, cc:cc + ps])
        cv2.imwrite(os.path.join(input_dir, f"{i+1}_{j+1}.png"),
                    noisy[rr:rr + ps, cc:cc + ps])


def generate_patches_sidd(src_dir: str, tar_dir: str, ps: int = 256,
                          num_patches: int = 300, num_cores: int = 10,
                          seed: int = 0) -> int:
    """Mirrors the reference CLI defaults (--ps 256 --num_patches 300
    --num_cores 10, generate_patches_SIDD.py:18-26); file discovery uses
    the same GT/NOISY name filters (:36-44)."""
    if os.path.exists(tar_dir):
        shutil.rmtree(tar_dir)
    gt_dir = os.path.join(tar_dir, "groundtruth")
    input_dir = os.path.join(tar_dir, "input")
    os.makedirs(gt_dir)
    os.makedirs(input_dir)

    files = sorted(glob(os.path.join(src_dir, "*", "*.PNG")))
    gt_files = [f for f in files if "GT" in os.path.basename(f)]
    noisy_files = [f for f in files if "NOISY" in os.path.basename(f)]
    assert len(gt_files) == len(noisy_files) and gt_files, \
        f"no GT/NOISY pairs under {src_dir}"

    jobs = [(i, g, n, gt_dir, input_dir, ps, num_patches, seed)
            for i, (g, n) in enumerate(zip(gt_files, noisy_files))]
    with ProcessPoolExecutor(max_workers=num_cores) as ex:
        list(ex.map(_save_patches, jobs))
    return len(jobs) * num_patches
