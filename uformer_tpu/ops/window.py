"""Window partition / reverse and cyclic shift on NHWC layouts.

TPU-native rewrite of the reference window ops (`/root/reference/model.py:704-726`,
`window_partition` / `window_reverse`): pure reshape/transpose that XLA fuses
into surrounding ops, no `.contiguous()` copies, no unfold/fold.

The dilated (`dilation_rate>1`) path — dead code for every shipped arch (no
reference caller ever passes it) — is reproduced for inventory completeness:
`partition` matches `F.unfold(kernel_size=win, dilation=d, padding=4*(d-1),
stride=win)` exactly (reference model.py:706-711), and `reverse` implements
the `F.fold` the reference *intends* (model.py:721-723 — the upstream code
crashes: it permutes a 4-D tensor with six indices). Note `F.fold` sums
overlapping dilated taps, so for d>1 reverse(partition(x)) is a tap-count
weighted x, not x — faithful to the reference's chosen operator. The static
tap indices are built with numpy at trace time; the gather/scatter lowers to
XLA gather/scatter-add with fully static shapes.

Shapes:
  partition: (B, H, W, C) -> (B * nWh * nWw, win*win, C)
  reverse:   (B * nWh * nWw, win*win, C) -> (B, H, W, C)
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _dilated_grid(H: int, W: int, win: int, d: int):
    """Static (row, col) tap indices into the zero-padded image.

    Mirrors F.unfold's patch grid: padding 4*(d-1) per side (the reference
    hard-codes 4 = win//2 for its win=8 models), stride win, dilation d.
    """
    p = 4 * (d - 1)
    ext = d * (win - 1) + 1                     # effective kernel extent
    oh = (H + 2 * p - ext) // win + 1
    ow = (W + 2 * p - ext) // win + 1
    rows = (np.arange(oh)[:, None] * win + np.arange(win)[None, :] * d)
    cols = (np.arange(ow)[:, None] * win + np.arange(win)[None, :] * d)
    return p, oh, ow, rows, cols


def window_partition(x: jnp.ndarray, win: int,
                     dilation_rate: int = 1) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, win*win, C), row-major window order.

    Matches the reference ordering: windows enumerate (h-block, w-block)
    row-major, tokens inside a window enumerate (row, col) row-major.
    """
    B, H, W, C = x.shape
    if dilation_rate != 1:
        d = int(dilation_rate)
        p, oh, ow, rows, cols = _dilated_grid(H, W, win, d)
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        y = xp[:, rows][:, :, :, cols]          # (B, oh, win, ow, win, C)
        y = y.transpose(0, 1, 3, 2, 4, 5)       # (B, oh, ow, win, win, C)
        return y.reshape(-1, win * win, C)
    if H % win or W % win:
        raise ValueError(f"H={H}, W={W} must be multiples of win={win}")
    x = x.reshape(B, H // win, win, W // win, win, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, nWh, nWw, win, win, C
    return x.reshape(-1, win * win, C)


def window_reverse(windows: jnp.ndarray, win: int, H: int, W: int,
                   dilation_rate: int = 1) -> jnp.ndarray:
    """(B*nW, win*win, C) -> (B, H, W, C). Inverse of :func:`window_partition`
    for dilation 1; the F.fold overlap-sum for dilation > 1 (see module
    docstring)."""
    C = windows.shape[-1]
    if dilation_rate != 1:
        d = int(dilation_rate)
        p, oh, ow, rows, cols = _dilated_grid(H, W, win, d)
        B = windows.shape[0] // (oh * ow)
        wt = windows.reshape(B, oh, ow, win, win, C) \
                    .transpose(0, 1, 3, 2, 4, 5)    # (B, oh, win, ow, win, C)
        rr = rows[:, :, None, None]                 # (oh, win, 1, 1)
        cc = cols[None, None, :, :]                 # (1, 1, ow, win)
        out = jnp.zeros((B, H + 2 * p, W + 2 * p, C), windows.dtype)
        out = out.at[:, rr, cc, :].add(wt)
        return out[:, p:p + H, p:p + W, :]
    B = windows.shape[0] // ((H // win) * (W // win))
    x = windows.reshape(B, H // win, W // win, win, win, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, nWh, win, nWw, win, C
    return x.reshape(B, H, W, C)


def window_partition_packed(x: jnp.ndarray, win: int, p: int) -> jnp.ndarray:
    """Bytes-identical to :func:`window_partition` but the relayout
    transpose runs on the (W/p, p*C) packed-column view, so XLA's copy
    moves full-128-lane tiles instead of lane-padded C-wide ones (narrow
    C pays ~p x on the (win, C)-minor transpose). Identity holds because
    (win/p)*p == win makes the packed and true token orders coincide."""
    B, H, W, C = x.shape
    W8 = W // win
    wp8 = win // p
    xp = x.reshape(B, H, W // p, p * C)
    y = xp.reshape(B, H // win, win, W8, wp8, p * C)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(-1, win * win, C)


def window_reverse_packed(windows: jnp.ndarray, win: int, H: int, W: int,
                          p: int) -> jnp.ndarray:
    """Packed-view twin of :func:`window_reverse` (see
    :func:`window_partition_packed`)."""
    C = windows.shape[-1]
    W8 = W // win
    wp8 = win // p
    B = windows.shape[0] // ((H // win) * W8)
    y = windows.reshape(B, H // win, W8, win, wp8, p * C)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, H, W, C)


def cyclic_shift_packed(x: jnp.ndarray, shift: int, p: int) -> jnp.ndarray:
    """Cyclic shift with the W roll on packed columns (requires
    p | shift): one full-lane roll instead of a lane-padded one."""
    if shift == 0:
        return x
    if shift % p:
        raise ValueError(f"packed shift requires p | shift, got {shift=} {p=}")
    B, H, W, C = x.shape
    xp = x.reshape(B, H, W // p, p * C)
    xp = jnp.roll(xp, shift=(-shift, -shift // p), axis=(1, 2))
    return xp.reshape(B, H, W, C)


def cyclic_unshift_packed(x: jnp.ndarray, shift: int, p: int) -> jnp.ndarray:
    if shift == 0:
        return x
    if shift % p:
        raise ValueError(f"packed shift requires p | shift, got {shift=} {p=}")
    B, H, W, C = x.shape
    xp = x.reshape(B, H, W // p, p * C)
    xp = jnp.roll(xp, shift=(shift, shift // p), axis=(1, 2))
    return xp.reshape(B, H, W, C)


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
