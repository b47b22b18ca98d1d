"""Fused Pallas window-attention kernel vs the jnp reference path.

Runs in interpret mode on the CPU test mesh; the same kernel compiles
natively on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uformer_tpu.models import Uformer
from uformer_tpu.ops.attention import _window_attention_jnp
from uformer_tpu.ops.masks import shift_window_mask
from uformer_tpu.ops.pallas.window_attention import fused_window_attention
from uformer_tpu.utils import init_params_fast


def _rand_qkv(rng, nH, Bw, N, D):
    qs = rng.normal(size=(3, Bw, nH, N, D)).astype(np.float32)
    return (jnp.asarray(qs[0]), jnp.asarray(qs[1]), jnp.asarray(qs[2]))


@pytest.mark.parametrize("shift", [0, 4])
def test_fused_matches_jnp(shift):
    H = W = 16
    win, nH, D, B = 8, 2, 16, 3
    N = win * win
    nW = (H // win) * (W // win)
    Bw = B * nW
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, nH, Bw, N, D)
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    scale = D ** -0.5

    mask = jnp.asarray(shift_window_mask(H, W, win, shift)) if shift else None
    want = _window_attention_jnp(q, k, v, bias, mask, scale=scale)

    got = fused_window_attention(
        q.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3),
        v.transpose(1, 0, 2, 3), bias, win=win, shift=shift, H=H, W=W,
        scale=scale, interpret=True)
    got = got.transpose(1, 2, 0, 3).reshape(Bw, N, nH * D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_odd_tile_alignment():
    # Bw not a multiple of 64 forces small tiles crossing image boundaries
    H, W, win, nH, D, B = 24, 16, 8, 1, 8, 1
    N = win * win
    nW = (H // win) * (W // win)  # 6
    Bw = B * nW
    rng = np.random.default_rng(1)
    q, k, v = _rand_qkv(rng, nH, Bw, N, D)
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    mask = jnp.asarray(shift_window_mask(H, W, win, 4))
    want = _window_attention_jnp(q, k, v, bias, mask, scale=0.3)
    got = fused_window_attention(
        q.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3),
        v.transpose(1, 0, 2, 3), bias, win=win, shift=4, H=H, W=W,
        scale=0.3, interpret=True)
    got = got.transpose(1, 2, 0, 3).reshape(Bw, N, nH * D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_model_pallas_backend_matches_jnp():
    kw = dict(img_size=32, embed_dim=8, depths=(1,) * 9,
              num_heads=(1, 2, 4, 8, 8, 8, 4, 2, 1), win_size=8,
              modulator=True, shift_flag=True)
    m_jnp = Uformer(attn_backend="jnp", **kw)
    m_pal = Uformer(attn_backend="pallas", **kw)
    x = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    params = init_params_fast(m_jnp, x)
    y1 = m_jnp.apply(params, x)
    y2 = m_pal.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=5e-5, rtol=1e-4)
