"""Static attention masks for shifted-window attention.

The reference builds the SW-MSA shift mask with Python loops over tensor
slices on every forward pass (`/root/reference/model.py:923-942`). Under
jit the (H, W, win, shift) tuple is static, so we precompute the mask once
in numpy per unique geometry (lru_cache) and let it enter the program as a
compile-time constant — zero runtime cost.

Mask convention matches the reference: additive bias, 0.0 where attention
is allowed, -100.0 where tokens come from different pre-shift regions.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

NEG_BIAS = -100.0


@functools.lru_cache(maxsize=256)
def shift_window_mask(H: int, W: int, win: int, shift: int) -> np.ndarray:
    """Additive SW-MSA mask, shape (nW, win*win, win*win), float32.

    Reproduces the 9-region construction of reference model.py:924-942:
    each token is labeled by its pre-shift region id; token pairs with
    different ids get -100.
    """
    assert 0 < shift < win
    region = np.zeros((H, W), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, H - win), slice(H - win, H - shift), slice(H - shift, H)):
        for ws in (slice(0, W - win), slice(W - win, W - shift), slice(W - shift, W)):
            region[hs, ws] = cnt
            cnt += 1
    # partition region ids into windows (row-major, same order as window_partition)
    r = region.reshape(H // win, win, W // win, win)
    r = r.transpose(0, 2, 1, 3).reshape(-1, win * win)  # nW, win*win
    diff = r[:, None, :] - r[:, :, None]  # nW, N, N  (same index order as ref)
    mask = np.where(diff != 0, np.float32(NEG_BIAS), np.float32(0.0))
    return mask


def input_mask_bias(mask: jnp.ndarray, H: int, W: int, win: int) -> jnp.ndarray:
    """Additive attention bias from a user input mask.

    Reference semantics (`model.py:913-919`): resize mask to (H, W) with
    nearest-neighbor interpolation, partition into windows, outer-product
    each window's token mask with itself, then every *nonzero* product
    becomes -100 (zero stays 0). `mask` is (B, 1, Hm, Wm) or (B, Hm, Wm, 1).

    Returns (B * nW, N, N) additive bias.
    """
    if mask.ndim != 4:
        raise ValueError("mask must be 4-D")
    if mask.shape[1] == 1 and mask.shape[-1] != 1:  # NCHW -> NHWC
        mask = mask.transpose(0, 2, 3, 1)
    B, Hm, Wm, _ = mask.shape
    if (Hm, Wm) != (H, W):
        # F.interpolate default is nearest — replicate via integer index map.
        rows = (jnp.arange(H) * Hm // H).astype(jnp.int32)
        cols = (jnp.arange(W) * Wm // W).astype(jnp.int32)
        mask = mask[:, rows][:, :, cols]
    m = mask.reshape(B, H // win, win, W // win, win)
    m = m.transpose(0, 1, 3, 2, 4).reshape(-1, win * win)  # B*nW, N
    prod = m[:, :, None] * m[:, None, :]
    return jnp.where(prod != 0, NEG_BIAS, 0.0).astype(jnp.float32)
