from uformer_tpu.ops.window import (  # noqa: F401
    window_partition,
    window_reverse,
    cyclic_shift,
    cyclic_unshift,
)
from uformer_tpu.ops.masks import shift_window_mask, input_mask_bias  # noqa: F401
from uformer_tpu.ops.relpos import relative_position_index, gather_bias  # noqa: F401
from uformer_tpu.ops.attention import window_attention  # noqa: F401
from uformer_tpu.ops.dwconv import depthwise_conv2d  # noqa: F401
from uformer_tpu.ops import pallas as _pallas_kernels  # noqa: F401  (registers)
