"""Standalone depthwise 3x3 Pallas kernel (SAME padding, stride 1).

The TPU-native equivalent of the reference's torch_dwconv CUDA extension
(`/root/reference/model.py:19`). For the full LeFF the fused kernel in
`uformer_tpu.ops.pallas.leff` is preferred (it keeps the 4x-wide hidden
tensor in VMEM); this standalone version backs the generic
`uformer_tpu.ops.depthwise_conv2d(backend='pallas')` API. Halo handling
uses the same overlapped-tiles gather as the LeFF kernel (Mosaic DMA
needs 128-aligned minor dims, which small-C stages violate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uformer_tpu.ops.pallas.leff import overlapped_tiles


def _make_kernel(Th: int, W: int, C: int, out_dtype, has_bias: bool):
    def kernel(x_ref, w_ref, b_ref, o_ref):
        xt = x_ref[0, 0]  # (Th+2, W+2, C); padding ring already zero
        acc = jnp.zeros((Th, W, C), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc += xt[dy:dy + Th, dx:dx + W, :].astype(jnp.float32) * \
                    w_ref[dy, dx, :].astype(jnp.float32)
        if has_bias:
            acc = acc + b_ref[:].astype(jnp.float32)
        o_ref[0] = acc.astype(out_dtype)

    return kernel


def _pick_th(H: int, W: int, C: int, itemsize: int,
             budget: int | None = None) -> int:
    if budget is None:
        budget = (10 if itemsize <= 2 else 4) * 2**20
    per_row = (W + 2) * max(C, 128) * (itemsize + 4)
    th = max(budget // max(per_row, 1) - 2, 1)
    th = min(th, H)
    while H % th:
        th -= 1
    return th


@functools.partial(jax.jit, static_argnames=("interpret",))
def dwconv3x3(x, w, b=None, *, interpret: bool = False):
    """x: (B, H, W, C); w: (3, 3, C); optional b: (C,)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Th = _pick_th(H, W, C, x.dtype.itemsize)
    x_ov = overlapped_tiles(xp, Th)
    has_bias = b is not None
    if b is None:
        b = jnp.zeros((C,), x.dtype)
    kernel = _make_kernel(Th, W, C, x.dtype, has_bias)
    return pl.pallas_call(
        kernel,
        grid=(B, H // Th),
        in_specs=[
            pl.BlockSpec((1, 1, Th + 2, W + 2, C),
                         lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Th, W, C), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        interpret=interpret,
    )(x_ov, w, b)
