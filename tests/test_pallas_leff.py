"""Fused LeFF / dwconv Pallas kernels vs jnp references (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uformer_tpu.models import Uformer
from uformer_tpu.ops.dwconv import _depthwise_conv2d_jnp
from uformer_tpu.ops.pallas.dwconv import dwconv3x3
from uformer_tpu.ops.pallas.leff import fused_leff, leff_reference
from uformer_tpu.utils import init_params_fast


@pytest.mark.parametrize("shape,hidden", [((2, 16, 24, 8), 32),
                                          ((1, 8, 8, 16), 64),
                                          ((1, 12, 20, 4), 16),
                                          # pixel-packed mode (C<128,
                                          # W % (128//C) == 0): p=4, p=2
                                          ((1, 16, 32, 32), 128),
                                          ((2, 16, 16, 64), 256)])
def test_fused_leff_matches_reference(shape, hidden):
    rng = np.random.default_rng(0)
    B, H, W, C = shape
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 0.5
    w1 = jnp.asarray(rng.normal(size=(C, hidden)).astype(np.float32)) * 0.1
    b1 = jnp.asarray(rng.normal(size=(hidden,)).astype(np.float32)) * 0.1
    wd = jnp.asarray(rng.normal(size=(3, 3, hidden)).astype(np.float32)) * 0.3
    bd = jnp.asarray(rng.normal(size=(hidden,)).astype(np.float32)) * 0.1
    w2 = jnp.asarray(rng.normal(size=(hidden, C)).astype(np.float32)) * 0.1
    b2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32)) * 0.1

    want = leff_reference(x, w1, b1, wd, bd, w2, b2)
    got = fused_leff(x, w1, b1, wd, bd, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)
    # folded-LN variant
    ln_s = jnp.asarray(rng.normal(size=(C,)).astype(np.float32)) * 0.1 + 1.0
    ln_b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32)) * 0.1
    want = leff_reference(x, w1, b1, wd, bd, w2, b2, ln_s=ln_s, ln_b=ln_b)
    got = fused_leff(x, w1, b1, wd, bd, w2, b2, ln_s=ln_s, ln_b=ln_b,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-5)


def test_dwconv3x3_matches_jnp():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    want = _depthwise_conv2d_jnp(x, w, b)
    got = dwconv3x3(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    # no-bias variant
    got2 = dwconv3x3(x, w, None, interpret=True)
    want2 = _depthwise_conv2d_jnp(x, w, None)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_fastleff_model_variant_runs():
    """token_mlp='fastleff' routes LeFF through the Pallas path (interpret
    on CPU) and matches the jnp leff numerically with shared params."""
    kw = dict(img_size=32, embed_dim=8, depths=(1,) * 9,
              num_heads=(1, 2, 4, 8, 8, 8, 4, 2, 1), win_size=8,
              modulator=True, shift_flag=False, attn_backend="jnp")
    m_fast = Uformer(token_mlp="fastleff", **kw)
    m_leff = Uformer(token_mlp="leff", **kw)
    x = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (1, 32, 32, 3))
        .astype(np.float32))
    params = init_params_fast(m_leff, x)
    y_fast = m_fast.apply(params, x)
    y_leff = m_leff.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_leff),
                               atol=1e-4, rtol=1e-4)


def test_dropout_active_leff_routes_to_jnp(monkeypatch):
    """Regression for the drop>0 routing bug: with the pallas backend
    resolved (as on TPU) and dropout ACTIVE, LeFF must (a) never reach a
    fused-kernel call (which has no dropout and, off-TPU, would run in
    interpret mode) and (b) actually apply dropout."""
    from uformer_tpu.models.layers import LeFF
    from uformer_tpu.ops import attention as attn_mod
    from uformer_tpu.ops.pallas import leff as leff_mod

    monkeypatch.setattr(attn_mod, "resolve_backend", lambda b: "pallas")

    def _boom(*a, **k):
        raise AssertionError("fused kernel reached with active dropout")

    monkeypatch.setattr(leff_mod, "fused_leff", _boom)
    monkeypatch.setattr(leff_mod, "fused_leff_ad", _boom)

    m = LeFF(hidden_dim=32, drop=0.5)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 8, 8, 8)).astype(np.float32))
    params = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=False)
    y1 = m.apply(params, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(2)})
    y2 = m.apply(params, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(3)})
    # dropout applied: different rngs give different outputs
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


@pytest.mark.parametrize("shape,hidden,has_ln,residual", [
    # the two heaviest variants run in the nightly (slow) tier only
    pytest.param((1, 16, 16, 128), 512, True, True,
                 marks=pytest.mark.slow),    # lane-aligned
    ((2, 16, 16, 32), 128, True, True),      # packed p=4
    ((1, 24, 16, 64), 256, False, False),    # packed p=2, no LN/residual
    pytest.param((1, 11, 8, 128), 384, True, False,
                 marks=pytest.mark.slow),    # odd H (pad path)
])
def test_fused_leff_bwd_matches_autodiff(shape, hidden, has_ln, residual):
    """The fused backward kernel == jax.grad of the jnp reference (fp32)."""
    from uformer_tpu.ops.pallas.leff import fused_leff_bwd

    rng = np.random.default_rng(0)
    B, H, W, C = shape
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.normal(size=(C, hidden)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=(hidden,)).astype(np.float32) * 0.1)
    wd = jnp.asarray(rng.normal(size=(3, 3, hidden)).astype(np.float32) * 0.2)
    bd = jnp.asarray(rng.normal(size=(hidden,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(hidden, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    ln_s = jnp.asarray(1.0 + rng.normal(size=(C,)).astype(np.float32) * 0.1)
    ln_b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    dy = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def loss(x, w1, b1, wd, bd, w2, b2, ln_s, ln_b):
        y = leff_reference(x, w1, b1, wd, bd, w2, b2,
                           ln_s=ln_s if has_ln else None,
                           ln_b=ln_b if has_ln else None, residual=residual)
        return jnp.sum(y * dy)

    want = jax.grad(loss, argnums=tuple(range(9)))(
        x, w1, b1, wd, bd, w2, b2, ln_s, ln_b)
    got = fused_leff_bwd(x, dy, w1, b1, wd, bd, w2, ln_s, ln_b,
                         has_ln=has_ln, residual=residual, interpret=True)
    names = ["dx", "dw1", "db1", "dwd", "dbd", "dw2", "db2", "dls", "dlb"]
    # b2 grad sits at index 6 in `want`; kernel returns it at index 6 too
    for i, name in enumerate(names):
        if not has_ln and name in ("dls", "dlb"):
            continue
        w = np.asarray(want[i])
        g = np.asarray(got[i])
        scale = max(np.abs(w).max(), 1.0)
        np.testing.assert_allclose(
            g, w, atol=2e-4 * scale, rtol=2e-4,
            err_msg=f"{name} mismatch (shape {shape}, ln={has_ln})")


@pytest.mark.parametrize("shape,hidden", [
    ((2, 16, 16, 128), 512),   # lane-aligned smallimg
    ((1, 16, 16, 32), 128),    # packed p=4
])
def test_fused_leff_bwd_bf16_taps(shape, hidden):
    """The opt-in bf16 tap path (conv_f32=False; the default f32 taps —
    bf16 measured slower on v5e — can also be flipped for a whole run
    via UFORMER_TPU_DWCONV_BF16=1, resolved at import): grads stay
    within bf16-path error of fp32 autodiff, weight-grad reductions
    stay fp32."""
    from uformer_tpu.ops.pallas.leff import fused_leff_bwd

    rng = np.random.default_rng(7)
    B, H, W, C = shape
    mk = lambda *s, sc=0.1: jnp.asarray(  # noqa: E731
        rng.normal(size=s).astype(np.float32) * sc)
    x = mk(*shape, sc=0.5)
    w1, b1 = mk(C, hidden), mk(hidden)
    wd, bd = mk(3, 3, hidden, sc=0.2), mk(hidden)
    w2, b2 = mk(hidden, C), mk(C)
    ln_s, ln_b = 1.0 + mk(C), mk(C)
    dy = mk(*shape, sc=1.0)

    def loss(x, w1, b1, wd, bd, w2, b2, ln_s, ln_b):
        y = leff_reference(x, w1, b1, wd, bd, w2, b2, ln_s=ln_s,
                           ln_b=ln_b, residual=True)
        return jnp.sum(y * dy)

    want = jax.grad(loss, argnums=tuple(range(9)))(
        x, w1, b1, wd, bd, w2, b2, ln_s, ln_b)
    cast = lambda v: v.astype(jnp.bfloat16)  # noqa: E731
    got = fused_leff_bwd(cast(x), cast(dy), cast(w1), b1, cast(wd), bd,
                         cast(w2), ln_s, ln_b, has_ln=True, residual=True,
                         interpret=True, conv_f32=False)
    names = ["dx", "dw1", "db1", "dwd", "dbd", "dw2", "db2", "dls", "dlb"]
    for i, name in enumerate(names):
        w = np.asarray(want[i], np.float32)
        g = np.asarray(got[i], np.float32)
        scale = max(np.abs(w).max(), 1.0)
        err = np.abs(g - w).max() / scale
        assert err < 0.06, f"{name} rel err {err} (shape {shape})"
