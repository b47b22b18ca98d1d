"""Pallas TPU kernels. Importing this package registers the dwconv kernel
with the generic op dispatcher; the fused attention/LeFF kernels are
called directly by the model layers."""

import jax

from uformer_tpu.ops.pallas.window_attention import fused_window_attention  # noqa: F401
from uformer_tpu.ops.pallas.leff import fused_leff  # noqa: F401
from uformer_tpu.ops.pallas.dwconv import dwconv3x3  # noqa: F401
from uformer_tpu.ops import dwconv as _dwconv_mod


def _dwconv_dispatch(x, w, b):
    if w.shape[0] != 3 or w.shape[1] != 3:
        return _dwconv_mod._depthwise_conv2d_jnp(x, w, b)
    return dwconv3x3(x, w, b, interpret=jax.default_backend() != "tpu")


_dwconv_mod.register_pallas_dwconv(_dwconv_dispatch)
