"""Fused window-attention Pallas TPU kernel.

The hottest kernel of the framework (reference WindowAttention.forward,
`/root/reference/model.py:494-522`). The XLA fallback materializes the
(Bw, nH, N, N) logits/probs tensors in HBM — ~tens of GB of traffic per
Uformer_B forward, which makes the whole model bandwidth-bound. This
kernel keeps the entire logits -> +bias -> +shift-mask -> softmax -> @v
pipeline in VMEM (fp32 softmax), and computes the SW-MSA shift mask
*inline* from window coordinates instead of reading a (nW, N, N) mask
tensor — zero mask traffic.

Layout contract (chosen so BlockSpecs stay trivial):
  q, k, v: (nH, Bw, N, D)   N = win*win, D = head_dim, Bw = B * nW
  bias:    (nH, N, N)       relative-position bias (fp32)
  out:     (nH, Bw, N, D)

Grid: (nH, Bw // T) — T windows of one head per step; the batched
(T, N, D) matmuls lower to MXU dot_general with a leading batch dim.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _region_ids(win: int, shift: int, size: int, w_idx, in_win):
    """Per-token region id along one axis. w_idx: (T, N) window coordinate
    along the axis; in_win: (T, N) in-window offset along the axis.
    Region 0/1/2 per the 9-region SW-MSA construction."""
    g = w_idx * win + in_win
    return ((g >= size - win).astype(jnp.int32)
            + (g >= size - shift).astype(jnp.int32))


def _make_kernel(T: int, N: int, D: int, win: int, shift: int,
                 H: int, W: int, scale: float, out_dtype):
    nW_w = W // win
    nW = (H // win) * nW_w

    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        q = q_ref[0]  # (T, N, D)
        k = k_ref[0]
        v = v_ref[0]
        logits = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (T, N, N)
        logits = logits * scale + bias_ref[0][None]

        if shift > 0:
            # inline SW-MSA mask from window coordinates, built directly at
            # (T, N) shape (Mosaic dislikes (T, win, win)->(T, N) reshapes)
            base = pl.program_id(1) * T
            widx = base + jax.lax.broadcasted_iota(jnp.int32, (T, N), 0)
            w_in_img = widx % nW
            wi = w_in_img // nW_w
            wj = w_in_img % nW_w
            n_off = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
            rh = _region_ids(win, shift, H, wi, n_off // win)
            rw = _region_ids(win, shift, W, wj, n_off % win)
            rid = rh * 3 + rw  # (T, N)
            neq = rid[:, :, None] != rid[:, None, :]
            logits = logits + jnp.where(neq, jnp.float32(-100.0), 0.0)

        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jax.lax.dot_general(
            probs, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = out.astype(out_dtype)

    return kernel


def _pick_tile(Bw: int, nW: int, itemsize: int) -> int:
    """Largest T dividing Bw under the VMEM budget: with N=64, lane padding
    to 128 and double-buffered q/k/v/out blocks plus fp32 logits/probs
    scratch, T=64 fits for <=2-byte dtypes; fp32 inputs need T<=32."""
    t_max = 64 if itemsize <= 2 else 32
    for t in (64, 32, 16, 8, 4, 2, 1):
        if t <= t_max and Bw % t == 0:
            return t
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("win", "shift", "H", "W", "scale", "interpret"))
def fused_window_attention(q, k, v, bias, *, win: int, shift: int,
                           H: int, W: int, scale: float,
                           interpret: bool = False):
    """q, k, v: (nH, Bw, N, D); bias: (nH, N, N) fp32. Returns (nH, Bw, N, D).

    Static geometry (win, shift, H, W) is baked into the compiled kernel;
    the shift mask is computed inline on the VPU.
    """
    nH, Bw, N, D = q.shape
    nW = (H // win) * (W // win)
    assert N == win * win, (N, win)
    assert Bw % nW == 0, (Bw, nW)
    T = _pick_tile(Bw, nW, q.dtype.itemsize)
    kernel = _make_kernel(T, N, D, win, shift, H, W, scale, q.dtype)

    grid = (nH, Bw // T)
    blk = lambda i, j: (i, j, 0, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, N, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, N, D), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nH, Bw, N, D), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * nH * Bw * N * N * D,
            bytes_accessed=(4 * nH * Bw * N * D * q.dtype.itemsize
                            + nH * N * N * 4),
            transcendentals=nH * Bw * N * N,
        ),
    )(q, k, v, bias.astype(jnp.float32))
