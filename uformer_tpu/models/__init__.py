from uformer_tpu.models.uformer import Uformer  # noqa: F401
from uformer_tpu.models.unet import UNet, ConvBlock  # noqa: F401
from uformer_tpu.models.registry import get_arch, ARCHS  # noqa: F401
