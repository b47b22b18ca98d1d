"""Relative position bias index for window attention.

Precomputes the (N, N) index into the (2*Wh-1)*(2*Ww-1) bias table used by
window attention (reference `/root/reference/model.py:462-478`). Pure
numpy, cached per window geometry — becomes a gather with a compile-time
constant index under jit.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=32)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(wh*ww, wh*ww) int32 index into a ((2*wh-1)*(2*ww-1),) bias table."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)  # 2, N
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)  # N, N, 2
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


def gather_bias(table, wh: int, ww: int):
    """Gather the per-head bias: table ((2wh-1)(2ww-1), nH) -> (nH, N, N)."""
    idx = relative_position_index(wh, ww)
    bias = table[idx.reshape(-1)].reshape(wh * ww, wh * ww, -1)
    return bias.transpose(2, 0, 1)
