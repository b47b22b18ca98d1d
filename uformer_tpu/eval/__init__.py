from uformer_tpu.eval.metrics import (  # noqa: F401
    batch_psnr,
    psnr_255,
    psnr_b,
    psnr_clamped,
    rgb2ycbcr,
    sidd_psnr,
    sidd_ssim,
    ssim_255,
    ssim_gaussian_map,
    ssim_uniform,
)
from uformer_tpu.eval.padding import (  # noqa: F401
    expand2square,
    pad_to_multiple,
    tiled_inference,
    unexpand,
    unpad,
)
from uformer_tpu.eval.image_io import load_img, save_img  # noqa: F401
