"""Pure-conv U-Net baseline (reference `/root/reference/model.py:83-199`).

Selectable via `--arch UNet`; same 4-level topology and residual ConvBlocks
as the reference, NHWC layout.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from uformer_tpu.models.layers import leaky_relu


class ConvBlock(nn.Module):
    """Two 3x3 conv + LeakyReLU with a 1x1 residual shortcut
    (reference model.py:83-105)."""

    out_dim: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = (self.strides, self.strides)
        y = nn.Conv(self.out_dim, (3, 3), strides=s, padding="SAME",
                    dtype=self.dtype, name="conv1")(x)
        y = leaky_relu(y)
        y = nn.Conv(self.out_dim, (3, 3), strides=s, padding="SAME",
                    dtype=self.dtype, name="conv2")(y)
        y = leaky_relu(y)
        shortcut = nn.Conv(self.out_dim, (1, 1), strides=s, dtype=self.dtype,
                           name="conv11")(x)
        return y + shortcut


class UNet(nn.Module):
    dim: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        del mask
        D = self.dim
        xs = x.astype(self.dtype)

        skips = []
        y = xs
        for k in range(4):
            y = ConvBlock(D * 2**k, dtype=self.dtype, name=f"ConvBlock{k + 1}")(y)
            skips.append(y)
            y = nn.Conv(D * 2**k, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name=f"pool{k + 1}")(y)

        y = ConvBlock(D * 16, dtype=self.dtype, name="ConvBlock5")(y)

        for k in range(4):
            y = nn.ConvTranspose(D * 2 ** (3 - k), (2, 2), strides=(2, 2),
                                 padding="VALID", transpose_kernel=True,
                                 dtype=self.dtype, name=f"upv{k + 6}")(y)
            y = jnp.concatenate([y, skips[3 - k]], axis=-1)
            y = ConvBlock(D * 2 ** (3 - k), dtype=self.dtype,
                          name=f"ConvBlock{k + 6}")(y)

        y = nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype, name="conv10")(y)
        return x.astype(jnp.float32) + y.astype(jnp.float32)
