"""Block-fused attention kernel vs jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uformer_tpu.models import Uformer
from uformer_tpu.ops.pallas.attention_block import (
    attention_block_reference,
    fused_attention_block,
)
from uformer_tpu.utils import init_params_fast


def _inputs(seed, Bw, N, C, nH):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32)) * 0.2  # noqa
    return dict(
        x=mk(Bw, N, C), mod=mk(N, C), ln_s=1.0 + 0.1 * mk(C),
        ln_b=0.1 * mk(C), wq=mk(C, C), bq=mk(C),
        wkv=mk(C, 2 * C), bkv=mk(2 * C), wo=mk(C, C), bo=mk(C),
        bias=mk(nH, N, N),
    )


@pytest.mark.parametrize("shift", [0, 4])
@pytest.mark.parametrize("nH", [1, 4])
def test_fused_block_matches_reference(shift, nH):
    H = W = 16
    win, B, C = 8, 2, 32
    N = win * win
    nW = (H // win) * (W // win)
    Bw = B * nW
    kw = dict(win=win, shift=shift, H=H, W=W, scale=0.17, num_heads=nH)
    inp = _inputs(0, Bw, N, C, nH)
    want = attention_block_reference(**inp, **kw)
    got = fused_attention_block(*inp.values(), interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_fused_block_gradient_matches_reference():
    H = W = 8
    win, B, C, nH = 8, 1, 16, 2
    N = win * win
    Bw = B
    kw = dict(win=win, shift=0, H=H, W=W, scale=0.25, num_heads=nH)
    inp = _inputs(1, Bw, N, C, nH)
    from uformer_tpu.ops.pallas.attention_block import fused_attention_block_ad

    def loss_fused(*args):
        return jnp.sum(fused_attention_block_ad(
            *args, interpret=True, **kw) ** 2)

    def loss_ref(*args):
        return jnp.sum(attention_block_reference(*args, **kw) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 2, 4, 6, 8))(*inp.values())
    g2 = jax.grad(loss_ref, argnums=(0, 2, 4, 6, 8))(*inp.values())
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_model_fused_block_matches_jnp_backend():
    kw = dict(img_size=32, embed_dim=8, depths=(1,) * 9,
              num_heads=(1, 2, 4, 8, 8, 8, 4, 2, 1), win_size=8,
              modulator=True, shift_flag=True)
    m_jnp = Uformer(attn_backend="jnp", **kw)
    m_pal = Uformer(attn_backend="pallas", **kw)
    x = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (1, 32, 32, 3))
        .astype(np.float32))
    params = init_params_fast(m_jnp, x)
    y1 = m_jnp.apply(params, x)
    y2 = m_pal.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("reason", ["conv_proj", "attn_dropout"])
def test_unfused_fallback_keeps_shift_mask(reason):
    """Regression: when the block requests the fused path (backend=pallas)
    but WindowAttention declines it (conv projection / active attention
    dropout), the SW-MSA shift mask must still be applied — shifted
    windows must not attend across window boundaries."""
    from uformer_tpu.models.layers import LeWinBlock

    kw = dict(dim=16, num_heads=2, win_size=8, shift_size=4)
    if reason == "conv_proj":
        kw["token_projection"] = "conv"
        det = True
    else:
        kw["attn_drop"] = 0.5
        det = False
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 16, 16, 16))
        .astype(np.float32))
    b_jnp = LeWinBlock(attn_backend="jnp", **kw)
    b_pal = LeWinBlock(attn_backend="pallas", **kw)
    params = b_jnp.init(jax.random.PRNGKey(0), x)
    rngs = {"dropout": jax.random.PRNGKey(7)}
    y1 = b_jnp.apply(params, x, deterministic=det, rngs=rngs)
    y2 = b_pal.apply(params, x, deterministic=det, rngs=rngs)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shift,nH,has_ln,has_mod", [
    (0, 2, True, True),
    (4, 4, False, True),
    (4, 1, True, False),
])
def test_fused_block_bwd_kernel_matches_autodiff(shift, nH, has_ln, has_mod):
    """The fused Pallas backward kernel == jax.grad of the jnp reference
    for every input, including the rel-pos bias and modulator."""
    from uformer_tpu.ops.pallas.attention_block import (
        fused_attention_block_bwd,
    )

    H = W = 16
    win, B, C = 8, 2, 32
    N = win * win
    Bw = B * (H // win) * (W // win)
    kw = dict(win=win, shift=shift, H=H, W=W, scale=0.17, num_heads=nH)
    inp = _inputs(3, Bw, N, C, nH)
    if not has_mod:
        inp["mod"] = jnp.zeros_like(inp["mod"])
    dy = jnp.asarray(
        np.random.default_rng(9).normal(size=(Bw, N, C)).astype(np.float32))

    def loss(*args):
        return jnp.sum(attention_block_reference(
            *args, has_ln=has_ln, **kw) * dy)

    want = jax.grad(loss, argnums=tuple(range(11)))(*inp.values())
    got = fused_attention_block_bwd(
        inp["x"], dy, inp["mod"], inp["ln_s"], inp["ln_b"], inp["wq"],
        inp["bq"], inp["wkv"], inp["bkv"], inp["wo"], inp["bo"],
        inp["bias"], has_ln=has_ln, has_mod=True, interpret=True, **kw)
    # kernel order: dx, dmod, dls, dlb, dwq, dbq, dwkv, dbkv, dwo, dbo, db
    names = ["dx", "dmod", "dls", "dlb", "dwq", "dbq", "dwkv", "dbkv",
             "dwo", "dbo", "dbias"]
    order = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    for gi, name, oi in zip(got, names, order):
        if not has_ln and name in ("dls", "dlb"):
            continue
        w = np.asarray(want[oi])
        g = np.asarray(gi)
        scale = max(np.abs(w).max(), 1.0)
        np.testing.assert_allclose(g, w, atol=2e-4 * scale, rtol=2e-4,
                                   err_msg=f"{name} (shift={shift})")


@pytest.mark.parametrize("geom", [(32, 1, 16, 16), (64, 2, 16, 24)])
@pytest.mark.parametrize("shift", [0, 4])
def test_packed_block_fwd_bwd_matches_reference(geom, shift, monkeypatch):
    """Pixel-packed narrow-C windowed kernels (fwd + fused bwd in kron
    space): parity vs the jnp reference and its autodiff."""
    from uformer_tpu.ops.pallas.attention_block import (
        fused_attention_block_bwd,
    )

    monkeypatch.setenv("UFORMER_TPU_PACKED_ATTN", "1")
    C, nH, H, W = geom
    N = 64
    Bw = (H // 8) * (W // 8)
    kw = dict(win=8, shift=shift, H=H, W=W, scale=0.17, num_heads=nH)
    inp = _inputs(11, Bw, N, C, nH)
    want = attention_block_reference(
        inp["x"], inp["mod"], None, None, inp["wq"], inp["bq"],
        inp["wkv"], inp["bkv"], inp["wo"], inp["bo"], inp["bias"],
        has_ln=False, **kw)
    got = fused_attention_block(
        inp["x"], inp["mod"], None, None, inp["wq"], inp["bq"],
        inp["wkv"], inp["bkv"], inp["wo"], inp["bo"], inp["bias"],
        has_ln=False, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)

    dy = jnp.asarray(np.random.default_rng(12)
                     .normal(size=(Bw, N, C)).astype(np.float32))

    def loss(x, mod, wq, bq, wkv, bkv, wo, bo, bias):
        return jnp.sum(attention_block_reference(
            x, mod, None, None, wq, bq, wkv, bkv, wo, bo, bias,
            has_ln=False, **kw) * dy)

    want_g = jax.grad(loss, argnums=tuple(range(9)))(
        inp["x"], inp["mod"], inp["wq"], inp["bq"], inp["wkv"],
        inp["bkv"], inp["wo"], inp["bo"], inp["bias"])
    got_g = fused_attention_block_bwd(
        inp["x"], dy, inp["mod"], None, None, inp["wq"], inp["bq"],
        inp["wkv"], inp["bkv"], inp["wo"], inp["bo"], inp["bias"],
        has_ln=False, has_mod=True, interpret=True, **kw)
    # got order: dx, dmod, dls, dlb, dwq, dbq, dwkv, dbkv, dwo, dbo, dbias
    got_map = dict(zip(["dx", "dmod", "dls", "dlb", "dwq", "dbq", "dwkv",
                        "dbkv", "dwo", "dbo", "dbias"], got_g))
    want_map = dict(zip(["dx", "dmod", "dwq", "dbq", "dwkv", "dbkv",
                         "dwo", "dbo", "dbias"], want_g))
    for name, w in want_map.items():
        g = np.asarray(got_map[name])
        w = np.asarray(w)
        scale = max(np.abs(w).max(), 1.0)
        np.testing.assert_allclose(g, w, atol=2e-4 * scale, rtol=2e-4,
                                   err_msg=f"{name} (C={C}, shift={shift})")


@pytest.mark.parametrize("geom", [(32, 1, 16, 16), (64, 2, 16, 24)])
@pytest.mark.parametrize("shift", [0, 4])
def test_packed_block_bwd_folded_ln_matches_autodiff(geom, shift):
    """The packed backward with FOLDED LN (packed-lane LN recompute +
    VJP, incl. dls/dlb) == jax.grad of the jnp reference — the kernel
    that lets narrow-C stages run the image-layout path in training."""
    from uformer_tpu.ops.pallas.attention_block import (
        fused_attention_block_bwd,
    )

    C, nH, H, W = geom
    N = 64
    Bw = (H // 8) * (W // 8)
    kw = dict(win=8, shift=shift, H=H, W=W, scale=0.17, num_heads=nH)
    inp = _inputs(21, Bw, N, C, nH)
    dy = jnp.asarray(np.random.default_rng(22)
                     .normal(size=(Bw, N, C)).astype(np.float32))

    def loss(*args):
        return jnp.sum(attention_block_reference(
            *args, has_ln=True, **kw) * dy)

    want = jax.grad(loss, argnums=tuple(range(11)))(*inp.values())
    got = fused_attention_block_bwd(
        inp["x"], dy, inp["mod"], inp["ln_s"], inp["ln_b"], inp["wq"],
        inp["bq"], inp["wkv"], inp["bkv"], inp["wo"], inp["bo"],
        inp["bias"], has_ln=True, has_mod=True, interpret=True,
        packed=True, **kw)
    names = ["dx", "dmod", "dls", "dlb", "dwq", "dbq", "dwkv", "dbkv",
             "dwo", "dbo", "dbias"]
    for gi, name, w in zip(got, names, want):
        w = np.asarray(w)
        g = np.asarray(gi)
        scale = max(np.abs(w).max(), 1.0)
        np.testing.assert_allclose(g, w, atol=2e-4 * scale, rtol=2e-4,
                                   err_msg=f"{name} (C={C}, shift={shift})")


@pytest.mark.slow
def test_packed_block_training_gradients_match_jnp(monkeypatch):
    """End-to-end training-path check: a narrow-C LeWinBlock in
    non-deterministic mode (the train route) with the packed kernels
    gives the same loss gradients as the jnp backend."""
    from uformer_tpu.models.layers import LeWinBlock

    monkeypatch.setenv("UFORMER_TPU_PACKED_ATTN", "1")
    kw = dict(dim=32, num_heads=1, win_size=8, shift_size=4,
              mlp_ratio=2.0, token_mlp="leff", modulator=True)
    x = jnp.asarray(np.random.default_rng(5)
                    .normal(size=(1, 16, 16, 32)).astype(np.float32) * 0.2)
    b_jnp = LeWinBlock(attn_backend="jnp", **kw)
    b_pal = LeWinBlock(attn_backend="pallas", **kw)
    params = b_jnp.init(jax.random.PRNGKey(0), x)
    rngs = {"dropout": jax.random.PRNGKey(7)}

    def loss(mod, p):
        y = mod.apply(p, x, deterministic=False, rngs=rngs)
        return jnp.mean(y ** 2)

    want = jax.grad(lambda p: loss(b_jnp, p))(params)
    got = jax.grad(lambda p: loss(b_pal, p))(params)
    for (kp, w), (_, g) in zip(
            jax.tree_util.tree_leaves_with_path(want),
            jax.tree_util.tree_leaves_with_path(got)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-4, rtol=2e-4,
            err_msg=jax.tree_util.keystr(kp))
