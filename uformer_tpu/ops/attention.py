"""Functional window-attention core.

This is the numerics contract shared by the jnp reference path and the
Pallas TPU kernel (`uformer_tpu.ops.pallas.window_attention`): given
already-projected q/k/v for a batch of windows, compute

    softmax((q * scale) @ k^T + rel_pos_bias [+ mask]) @ v

matching `/root/reference/model.py:494-522` (WindowAttention.forward).
Logits and softmax run in float32 regardless of input dtype (the torch
reference runs them in fp32 under autocast as well — softmax is on the
AMP fp32 list); the output is cast back to the input dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

def resolve_backend(backend: str = "auto") -> str:
    """Resolve 'auto' to 'pallas' on TPU else 'jnp'.

    Called at trace time, not inside the kernel — the choice is baked into
    the jitted program. 'pallas' on non-TPU backends runs the kernel in
    interpret mode (used by the CPU test suite).
    """
    if backend != "auto":
        return backend
    return "pallas" if jax.default_backend() == "tpu" else "jnp"


def window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    scale: float,
    backend: str = "auto",
) -> jnp.ndarray:
    """Batched window MHSA.

    Args:
      q, k, v: (Bw, nH, N, D) — Bw = batch * num_windows, N = win*win.
      bias: (nH, N, N) relative-position bias (fp32).
      mask: optional additive mask, shape (nW, N, N) with Bw % nW == 0
        (tiled over batch, reference model.py:508-513) or (Bw, N, N).
      scale: q scaling (head_dim ** -0.5 unless qk_scale overrides).
      backend: accepted for API symmetry; this functional op always runs
        the jnp form. The fused TPU kernels need static window geometry
        and projection weights — use the model layers (auto-fused) or
        `uformer_tpu.ops.pallas.{fused_window_attention,
        fused_attention_block}` directly.

    Returns:
      (Bw, N, nH*D) merged-head output, same dtype as q.
    """
    del backend
    return _window_attention_jnp(q, k, v, bias, mask, scale=scale)


def _window_attention_jnp(q, k, v, bias, mask, *, scale):
    # Matmuls keep the input dtype (bf16 on TPU -> native MXU path) with
    # fp32 accumulation; logit bias-add and softmax run in fp32.
    Bw, nH, N, D = q.shape
    out_dtype = q.dtype
    attn = jnp.einsum(
        "bhnd,bhmd->bhnm", q * jnp.asarray(scale, q.dtype), k,
        preferred_element_type=jnp.float32,
    )
    attn = attn + bias.astype(jnp.float32)[None]
    if mask is not None:
        mask = mask.astype(jnp.float32)
        if mask.shape[0] == Bw:
            attn = attn + mask[:, None]
        else:
            nW = mask.shape[0]
            attn = attn.reshape(Bw // nW, nW, nH, N, N) + mask[None, :, None]
            attn = attn.reshape(Bw, nH, N, N)
    attn = jax.nn.softmax(attn, axis=-1).astype(out_dtype)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32,
    )
    out = out.transpose(0, 2, 1, 3).reshape(Bw, N, nH * D)
    return out.astype(out_dtype)
