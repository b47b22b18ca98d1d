"""Depthwise 2-D convolution on NHWC.

The reference's one custom-kernel dependency is a CUDA depthwise conv
(`torch_dwconv.DepthwiseConv2d`, `/root/reference/model.py:19,23`) used by
FastLeFF; the vanilla LeFF uses `nn.Conv2d(groups=C)` (`model.py:660`).
Here the depthwise conv is a first-class op with a jnp/XLA path (grouped
`conv_general_dilated`, which XLA lowers well on TPU) and an optional
Pallas fused path registered by `uformer_tpu.ops.pallas`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PALLAS_DWCONV = None


def register_pallas_dwconv(fn) -> None:
    global _PALLAS_DWCONV
    _PALLAS_DWCONV = fn


def depthwise_conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    backend: str = "auto",
) -> jnp.ndarray:
    """Depthwise conv, stride 1, SAME padding.

    Args:
      x: (B, H, W, C).
      w: (kh, kw, C) per-channel filters (HWC layout; torch stores
        (C, 1, kh, kw) — the converter transposes).
      b: optional (C,) bias.
    """
    if backend == "auto":
        backend = (
            "pallas"
            if _PALLAS_DWCONV is not None and jax.default_backend() == "tpu"
            else "jnp"
        )
    if backend == "pallas":
        if _PALLAS_DWCONV is None:
            raise RuntimeError("pallas dwconv kernel not registered")
        return _PALLAS_DWCONV(x, w, b)
    return _depthwise_conv2d_jnp(x, w, b)


def _depthwise_conv2d_jnp(x, w, b):
    C = x.shape[-1]
    kh, kw, wc = w.shape
    assert wc == C, (w.shape, x.shape)
    # HWIO with feature_group_count=C: kernel (kh, kw, 1, C)
    kernel = w.reshape(kh, kw, 1, C).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
