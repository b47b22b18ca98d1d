"""Auxiliary blocks catalogued in the reference but unused by its shipped
architectures (SURVEY.md §2.1 "dead code" rows) — provided for capability
parity so every reference component has a working TPU-native counterpart.

All NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from uformer_tpu.models.layers import leaky_relu


class SAM(nn.Module):
    """Supervised Attention Module (MPRNet-style; reference model.py:66-79).

    Returns (gated features, restored image)."""

    n_feat: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_img):
        k = (self.kernel_size, self.kernel_size)
        x1 = nn.Conv(self.n_feat, k, padding="SAME", use_bias=self.use_bias,
                     dtype=self.dtype, name="conv1")(x)
        img = nn.Conv(3, k, padding="SAME", use_bias=self.use_bias,
                      dtype=self.dtype, name="conv2")(x) + x_img
        gate = jax.nn.sigmoid(
            nn.Conv(self.n_feat, k, padding="SAME", use_bias=self.use_bias,
                    dtype=self.dtype, name="conv3")(img))
        return x1 * gate + x, img


class LPU(nn.Module):
    """Local perception unit: x + depthwise3x3(x) (reference model.py:202-227)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from uformer_tpu.ops import depthwise_conv2d

        C = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(), (3, 3, C))
        b = self.param("bias", nn.initializers.zeros, (C,))
        return x + depthwise_conv2d(x, w, b, backend="jnp")


class PosCNN(nn.Module):
    """Conv positional encoding (reference model.py:230-250): x + (or =)
    depthwise3x3 stride-s of x."""

    embed_dim: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 1, C))
        conv = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        return x + conv if self.stride == 1 else conv


class SELayer(nn.Module):
    """Squeeze-excite over tokens (reference model.py:252-277; the repo's
    --att_se flag exists but was never wired upstream)."""

    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        y = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))  # (B, C)
        y = nn.Dense(C // self.reduction, use_bias=False, dtype=self.dtype,
                     name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(C, use_bias=False, dtype=self.dtype, name="fc2")(y)
        gate = jax.nn.sigmoid(y).reshape(
            (-1,) + (1,) * (x.ndim - 2) + (C,))
        return x * gate.astype(x.dtype)


class EcaLayer(nn.Module):
    """2-D efficient channel attention (reference eca_layer, model.py:279-305);
    the 1-D token variant lives in layers.Eca1d."""

    k_size: int = 3

    @nn.compact
    def __call__(self, x):
        from uformer_tpu.models.layers import Eca1d

        return Eca1d(k_size=self.k_size, name="eca")(x)


class BlurPool2D(nn.Module):
    """Anti-aliased strided downsampling (BlurPool; reference
    `utils/antialias.py:7-58` — dead code upstream, provided for inventory
    parity): depthwise binomial low-pass filter then stride-`stride`
    subsampling, reflect-padded. NHWC."""

    filt_size: int = 3
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        from scipy.special import comb

        n = self.filt_size
        a = jnp.asarray([float(comb(n - 1, k)) for k in range(n)])
        filt2d = (a[:, None] * a[None, :])
        filt2d = (filt2d / filt2d.sum()).astype(x.dtype)
        C = x.shape[-1]
        pad_lo = (n - 1) // 2
        pad_hi = -(-(n - 1) // 2)
        if n == 1:
            return x[:, ::self.stride, ::self.stride]
        xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)),
                     mode="reflect")
        kernel = jnp.tile(filt2d[:, :, None, None], (1, 1, 1, C))
        return jax.lax.conv_general_dilated(
            xp, kernel, (self.stride, self.stride), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)


class BlurPool1D(nn.Module):
    """1-D variant (reference antialias.py:60-113) over (B, L, C)."""

    filt_size: int = 3
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        from scipy.special import comb

        n = self.filt_size
        a = jnp.asarray([float(comb(n - 1, k)) for k in range(n)])
        filt = (a / a.sum()).astype(x.dtype)
        C = x.shape[-1]
        if n == 1:
            return x[:, ::self.stride]
        pad_lo = (n - 1) // 2
        pad_hi = -(-(n - 1) // 2)
        xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0)), mode="reflect")
        kernel = jnp.tile(filt[:, None, None], (1, 1, C))
        return jax.lax.conv_general_dilated(
            xp, kernel, (self.stride,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=C)
