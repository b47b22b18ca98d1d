"""Shape, init, and gradient smoke tests for the model family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uformer_tpu.models import Uformer, UNet, get_arch, ARCHS


def tiny_uformer(**kw):
    cfg = dict(img_size=32, embed_dim=8, depths=(1,) * 9,
               num_heads=(1, 2, 4, 8, 8, 8, 4, 2, 1), win_size=8,
               modulator=True, attn_backend="jnp")
    cfg.update(kw)
    return Uformer(**cfg)


@pytest.mark.slow
def test_uformer_forward_shape_and_residual():
    model = tiny_uformer()
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 32, 32, 3)
    # zero input + global residual: output equals the conv stack output; with
    # nonzero input the residual must appear
    x2 = jnp.ones((1, 32, 32, 3))
    y2 = model.apply(params, x2)
    assert not np.allclose(np.asarray(y2), np.asarray(y))


@pytest.mark.slow
def test_uformer_nonsquare_input():
    # NHWC core removes the reference's square-input restriction
    model = tiny_uformer()
    x = jnp.zeros((1, 32, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 32, 64, 3)


@pytest.mark.slow
def test_uformer_shift_flag_variants():
    for shift_flag in (True, False):
        model = tiny_uformer(shift_flag=shift_flag)
        x = jnp.ones((1, 32, 32, 3)) * 0.5
        params = model.init(jax.random.PRNGKey(1), x)
        y = model.apply(params, x)
        assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_uformer_dd_in_4ch():
    model = tiny_uformer(dd_in=4)
    x = jnp.ones((1, 32, 32, 4))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 32, 32, 3)  # no global residual for dd_in != 3


@pytest.mark.slow
def test_uformer_train_mode_droppath_rng():
    model = tiny_uformer(drop_path_rate=0.5)
    x = jnp.ones((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y1 = model.apply(params, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = model.apply(params, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


@pytest.mark.slow
def test_uformer_grads_finite():
    model = tiny_uformer()
    x = jnp.ones((1, 32, 32, 3)) * 0.3
    tgt = jnp.zeros_like(x)
    params = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(p):
        y = model.apply(p, x)
        return jnp.mean(jnp.sqrt((y - tgt) ** 2 + 1e-6))

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_unet_forward():
    model = UNet(dim=8)
    x = jnp.ones((1, 32, 32, 3)) * 0.2
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == x.shape


def test_registry_all_archs_construct():
    for name in ARCHS:
        m = get_arch({"arch": name, "train_ps": 128, "embed_dim": 32})
        assert m is not None


def test_registry_uformer_b_param_count():
    """Uformer_B ~ 50.88M params (reference README's scale; flops harness
    model.py:1331-1344 prints params for Uformer16)."""
    m = get_arch({"arch": "Uformer_B", "train_ps": 128,
                  "attn_backend": "jnp"})
    x = jnp.zeros((1, 128, 128, 3))
    params = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    assert 45e6 < n < 56e6, n


@pytest.mark.slow
def test_mlp_token_variant():
    model = tiny_uformer(token_mlp="mlp")
    x = jnp.ones((1, 32, 32, 3)) * 0.1
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == x.shape


@pytest.mark.slow
def test_conv_projection_variant():
    model = tiny_uformer(token_projection="conv")
    x = jnp.ones((1, 32, 32, 3)) * 0.1
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == x.shape


def test_cross_modulator_variant():
    model = tiny_uformer(cross_modulator=True)
    x = jnp.ones((1, 32, 32, 3)) * 0.1
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == x.shape


@pytest.mark.slow
def test_dropout_branches_train_mode():
    """drop_rate/attn_drop > 0 exercise the unfused dropout paths (the
    reference's default archs use 0.0; the flags still must work)."""
    model = tiny_uformer(drop_rate=0.1, attn_drop_rate=0.1,
                         drop_path_rate=0.1)
    x = jnp.ones((2, 32, 32, 3)) * 0.4
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x)
    y = model.apply(params, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(y)).all()
    # eval mode is deterministic regardless of the rates
    y1 = model.apply(params, x)
    y2 = model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


@pytest.mark.slow
def test_gradients_through_dropout_branches():
    model = tiny_uformer(drop_rate=0.1, attn_drop_rate=0.1)
    x = jnp.ones((1, 32, 32, 3)) * 0.3
    params = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(p):
        y = model.apply(p, x, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(3)})
        return jnp.mean(y ** 2)

    g = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_cast_weights_inference_parity():
    """Pre-cast bf16 serving weights are semantics-preserving: flax casts
    params to the module dtype at apply time anyway, so casting >=2-D
    weights once must give bit-identical outputs (biases / LN vectors /
    rel-pos tables stay fp32 — the kernels consume those in fp32)."""
    from uformer_tpu.utils import cast_weights

    model = tiny_uformer(dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    y_ref = model.apply(params, x)
    cast = cast_weights(params)
    y_cast = model.apply(cast, x)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_cast))
    # 1-D leaves and rel-pos tables kept fp32, >=2-D weights now bf16
    flat = jax.tree_util.tree_flatten_with_path(cast)[0]
    for path, leaf in flat:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if leaf.ndim >= 2 and "relative_position" not in name:
            assert leaf.dtype == jnp.bfloat16, (path, leaf.dtype)
        else:
            assert leaf.dtype == jnp.float32, (path, leaf.dtype)


def test_train_mode_keeps_bf16_residual_stream():
    """Stochastic-depth rates must not promote the bf16 residual stream:
    an np.float64 rate inside DropPath silently upcast every stage with
    rate > 0 to f32 (2-3x slower fused kernels — found round 4 via
    per-instance kernel profiling). eval_shape-only: no compute."""
    from uformer_tpu.models import Uformer
    from uformer_tpu.utils import init_params_fast

    model = Uformer(img_size=32, embed_dim=8, depths=(1,) * 9,
                    num_heads=(1, 2, 4, 8, 8, 8, 4, 2, 1), win_size=2,
                    modulator=True, drop_path_rate=0.1,
                    dtype=jnp.bfloat16, attn_backend="jnp")
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = jax.eval_shape(lambda: init_params_fast(model, x))

    def f(p, key):
        _, st = model.apply(p, x, deterministic=False,
                            rngs={"dropout": key},
                            capture_intermediates=True)
        return st["intermediates"]

    inter = jax.eval_shape(f, params, jax.random.PRNGKey(0))
    bad = []
    for name in [f"encoderlayer_{k}" for k in range(4)] + ["conv"] + \
            [f"decoderlayer_{k}" for k in range(4)]:
        leaf = inter[name]["__call__"][0]
        if leaf.dtype != jnp.bfloat16:
            bad.append((name, str(leaf.dtype)))
    assert not bad, f"promoted stages: {bad}"
