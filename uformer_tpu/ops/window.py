"""Window partition / reverse and cyclic shift on NHWC layouts.

TPU-native rewrite of the reference window ops (`/root/reference/model.py:704-726`,
`window_partition` / `window_reverse`): pure reshape/transpose that XLA fuses
into surrounding ops, no `.contiguous()` copies, no unfold/fold. The dilated
(`dilation_rate>1`) path of the reference is dead code for all shipped archs
and is intentionally not reproduced.

Shapes:
  partition: (B, H, W, C) -> (B * nWh * nWw, win*win, C)
  reverse:   (B * nWh * nWw, win*win, C) -> (B, H, W, C)
"""

from __future__ import annotations

import jax.numpy as jnp


def window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, win*win, C), row-major window order.

    Matches the reference ordering: windows enumerate (h-block, w-block)
    row-major, tokens inside a window enumerate (row, col) row-major.
    """
    B, H, W, C = x.shape
    if H % win or W % win:
        raise ValueError(f"H={H}, W={W} must be multiples of win={win}")
    x = x.reshape(B, H // win, win, W // win, win, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, nWh, nWw, win, win, C
    return x.reshape(-1, win * win, C)


def window_reverse(windows: jnp.ndarray, win: int, H: int, W: int) -> jnp.ndarray:
    """(B*nW, win*win, C) -> (B, H, W, C). Inverse of :func:`window_partition`."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // win) * (W // win))
    x = windows.reshape(B, H // win, W // win, win, win, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, nWh, win, nWw, win, C
    return x.reshape(B, H, W, C)


def cyclic_shift(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Roll H and W by -shift (the SW-MSA pre-shift, reference model.py:957)."""
    if shift == 0:
        return x
    return jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))


def cyclic_unshift(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Roll H and W by +shift (reverse of :func:`cyclic_shift`)."""
    if shift == 0:
        return x
    return jnp.roll(x, shift=(shift, shift), axis=(1, 2))
