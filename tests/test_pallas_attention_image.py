"""Image-layout fused attention sub-block vs jnp reference (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uformer_tpu.models import Uformer
from uformer_tpu.ops.pallas.attention_image import (
    attention_image_reference,
    fused_attention_image,
    fused_attention_image_ad,
)
from uformer_tpu.utils import init_params_fast


def _inputs(seed, B, H, W, C, nH):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32)) * 0.2  # noqa
    return dict(
        x=mk(B, H, W, C), mod=mk(64, C), ln_s=1.0 + 0.1 * mk(C),
        ln_b=0.1 * mk(C), wq=mk(C, C), bq=mk(C), wkv=mk(C, 2 * C),
        bkv=mk(2 * C), wo=mk(C, C), bo=mk(C), bias=mk(nH, 64, 64),
    )


@pytest.mark.parametrize("shift", [0, 4])
@pytest.mark.parametrize("geom", [(1, 32, 16, 128, 1), (1, 16, 24, 256, 8),
                                  (2, 16, 16, 128, 4)])
def test_image_block_matches_reference(geom, shift):
    B, H, W, C, nH = geom
    kw = dict(win=8, shift=shift, scale=0.17, num_heads=nH, residual=True)
    inp = _inputs(0, B, H, W, C, nH)
    want = attention_image_reference(**inp, **kw)
    got = fused_attention_image(*inp.values(), interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_image_block_no_mod_no_ln_no_residual():
    inp = _inputs(1, 1, 16, 16, 128, 4)
    inp["mod"] = None
    inp["ln_s"] = None
    inp["ln_b"] = None
    kw = dict(win=8, shift=4, scale=0.2, num_heads=4, residual=False,
              has_ln=False)
    want = attention_image_reference(**inp, **kw)
    got = fused_attention_image(*inp.values(), interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_image_block_gradient_matches_reference():
    inp = _inputs(2, 1, 16, 16, 128, 4)
    kw = dict(win=8, shift=4, scale=0.17, num_heads=4, residual=True)

    def loss_fused(*a):
        return jnp.sum(fused_attention_image_ad(*a, interpret=True, **kw) ** 2)

    def loss_ref(*a):
        return jnp.sum(attention_image_reference(*a, **kw) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 4, 6, 8))(*inp.values())
    g2 = jax.grad(loss_ref, argnums=(0, 4, 6, 8))(*inp.values())
    for a, b in zip(g1, g2):
        scale = float(jnp.abs(b).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=5e-5, rtol=5e-5)


@pytest.mark.slow
def test_uformer_image_path_matches_jnp_backend():
    """Full tiny Uformer: pallas backend (image kernels on lane-aligned
    stages, incl. SW-MSA blocks at 16x16) vs jnp backend, same params."""
    kw = dict(img_size=64, embed_dim=32, depths=(1, 1, 2, 1, 1, 1, 2, 1, 1),
              num_heads=(1, 2, 4, 8, 16, 16, 8, 4, 2), win_size=8,
              modulator=True, dtype=jnp.float32)
    m_jnp = Uformer(attn_backend="jnp", **kw)
    m_pal = Uformer(attn_backend="pallas", **kw)
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    p = init_params_fast(m_jnp, x)
    y1 = m_jnp.apply(p, x, deterministic=True)
    y2 = m_pal.apply(p, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("shift", [0, 4])
@pytest.mark.parametrize("geom", [(1, 16, 16, 32, 1), (2, 16, 24, 64, 2),
                                  (1, 32, 16, 64, 1),
                                  (1, 16, 24, 32, 1)])  # W8=3 odd -> g=1
def test_packed_image_block_matches_reference(geom, shift):
    """Pixel-packed narrow-C variant (p = 128//C): kron projections,
    perm-order attention core, packed LN/rolls/window chains."""
    B, H, W, C, nH = geom
    kw = dict(win=8, shift=shift, scale=0.17, num_heads=nH, residual=True)
    inp = _inputs(3, B, H, W, C, nH)
    want = attention_image_reference(**inp, **kw)
    got = fused_attention_image(*inp.values(), interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_packed_image_block_no_mod_no_ln_no_residual():
    inp = _inputs(4, 1, 16, 16, 32, 1)
    inp["mod"] = None
    inp["ln_s"] = None
    inp["ln_b"] = None
    kw = dict(win=8, shift=4, scale=0.2, num_heads=1, residual=False,
              has_ln=False)
    want = attention_image_reference(**inp, **kw)
    got = fused_attention_image(*inp.values(), interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_packed_routing_basiclayer_matches_jnp(monkeypatch):
    """With UFORMER_TPU_PACKED_ATTN set, narrow-C (32/64) BasicLayers
    route attention through the packed image kernel; outputs match the
    jnp per-block path with shared params."""
    from uformer_tpu.models.layers import BasicLayer

    monkeypatch.setenv("UFORMER_TPU_PACKED_ATTN", "1")
    for C, nH in ((32, 1), (64, 2)):
        kw = dict(dim=C, depth=2, num_heads=nH, win_size=8, resolution=16,
                  mlp_ratio=2.0, token_mlp="leff", modulator=True,
                  shift_flag=True)
        x = jnp.asarray(
            np.random.default_rng(C).normal(size=(1, 16, 16, C))
            .astype(np.float32) * 0.2)
        l_jnp = BasicLayer(attn_backend="jnp", **kw)
        l_pk = BasicLayer(attn_backend="pallas", **kw)
        params = l_jnp.init(jax.random.PRNGKey(0), x)
        want = l_jnp.apply(params, x)
        got = l_pk.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)
