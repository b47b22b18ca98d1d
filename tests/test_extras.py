"""Extras (reference dead-code blocks), freeze utils, debug, flops report."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from uformer_tpu.models.extras import LPU, SAM, EcaLayer, PosCNN, SELayer


def _x(shape=(2, 8, 8, 16), seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(0, 1, shape).astype(np.float32))


def test_sam():
    m = SAM(n_feat=16)
    x = _x()
    img = _x((2, 8, 8, 3), 1)
    params = m.init(jax.random.PRNGKey(0), x, img)
    feats, out_img = m.apply(params, x, img)
    assert feats.shape == x.shape and out_img.shape == img.shape


@pytest.mark.parametrize("cls", [LPU, SELayer, EcaLayer])
def test_identity_shaped_extras(cls):
    m = cls()
    x = _x()
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


def test_poscnn_strides():
    m = PosCNN(embed_dim=16)
    x = _x()
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == x.shape
    m2 = PosCNN(embed_dim=16, stride=2)
    p2 = m2.init(jax.random.PRNGKey(0), x)
    assert m2.apply(p2, x).shape == (2, 4, 4, 16)


def test_freeze_utils():
    from uformer_tpu.utils.freeze import freeze, freeze_mask, is_frozen, path_matches

    params = {"params": {"enc": {"kernel": jnp.ones((2, 2))},
                         "dec": {"kernel": jnp.ones((2, 2))}}}
    tx = freeze(optax.sgd(0.1), params, lambda p: path_matches(p, "enc"))
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["params"]["enc"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["params"]["dec"]["kernel"]).max()) > 0.0
    mask = freeze_mask(params, lambda p: True)
    assert is_frozen(mask)


def test_assert_finite_raises():
    from uformer_tpu.utils.debug import assert_finite

    assert_finite({"a": jnp.ones(3)})  # fine
    with pytest.raises(Exception):
        jax.block_until_ready(
            assert_finite({"a": jnp.array([1.0, jnp.nan])})["a"])


def test_model_complexity_report():
    from uformer_tpu.models import Uformer
    from uformer_tpu.utils.flops import model_complexity

    m = Uformer(img_size=32, embed_dim=8, depths=(1,) * 9,
                num_heads=(1, 2, 4, 8, 8, 8, 4, 2, 1), win_size=8,
                attn_backend="jnp")
    info = model_complexity(m, (1, 32, 32, 3))
    assert info["params_m"] > 0.1 and info["gflops"] > 0.01


def test_blurpool():
    from uformer_tpu.models.extras import BlurPool1D, BlurPool2D

    x = _x((2, 8, 8, 4))
    m = BlurPool2D()
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (2, 4, 4, 4)
    # constant input is preserved by the normalized binomial filter
    c = jnp.full((1, 8, 8, 4), 0.7)
    yc = m.apply(m.init(jax.random.PRNGKey(0), c), c)
    np.testing.assert_allclose(np.asarray(yc), 0.7, rtol=1e-6)

    x1 = _x((2, 16, 4))
    m1 = BlurPool1D()
    y1 = m1.apply(m1.init(jax.random.PRNGKey(0), x1), x1)
    assert y1.shape == (2, 8, 4)
