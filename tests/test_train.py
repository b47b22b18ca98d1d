"""Training stack tests: losses, schedules, augs, train step, sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uformer_tpu.data import (
    dihedral_transform,
    mixup_batch,
    random_crop_pair,
    random_dihedral_batch,
)
from uformer_tpu.models import Uformer
from uformer_tpu.parallel import batch_sharding, make_mesh
from uformer_tpu.train import (
    TrainState,
    charbonnier_loss,
    make_eval_step,
    make_optimizer,
    make_train_step,
    step_lr_schedule,
    tv_loss,
    warmup_cosine_schedule,
)
from uformer_tpu.utils import init_params_fast


def tiny_model(**kw):
    cfg = dict(img_size=32, embed_dim=8, depths=(1,) * 9,
               num_heads=(1, 2, 4, 8, 8, 8, 4, 2, 1), win_size=2,
               modulator=True, attn_backend="jnp")
    cfg.update(kw)
    return Uformer(**cfg)


def test_charbonnier_matches_formula():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    b = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    got = float(charbonnier_loss(jnp.asarray(a), jnp.asarray(b)))
    want = float(np.mean(np.sqrt((a - b) ** 2 + 1e-6)))
    assert abs(got - want) < 1e-6


def test_tv_loss_zero_for_constant():
    x = jnp.full((2, 8, 8, 3), 0.7)
    assert float(tv_loss(x)) == 0.0


def test_warmup_cosine_schedule():
    spe = 10
    s = warmup_cosine_schedule(2e-4, nepoch=250, steps_per_epoch=spe,
                               warmup_epochs=3)
    # epoch 1..3 linear ramp
    assert abs(float(s(0)) - 2e-4 / 3) < 1e-9
    assert abs(float(s(1 * spe)) - 2e-4 * 2 / 3) < 1e-9
    assert abs(float(s(2 * spe)) - 2e-4) < 1e-9
    # late epochs decay toward eta_min
    assert float(s(249 * spe)) < 2e-5
    assert float(s(249 * spe)) >= 1e-6 - 1e-12


def test_step_lr_schedule():
    spe = 10
    s = step_lr_schedule(2e-4, steps_per_epoch=spe, step_size=50, gamma=0.5)
    assert abs(float(s(0)) - 2e-4) < 1e-12
    assert abs(float(s(49 * spe)) - 1e-4) < 1e-12  # epoch 50 -> halved
    assert abs(float(s(99 * spe)) - 5e-5) < 1e-12


def test_dihedral_ops_are_bijections():
    x = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
    seen = set()
    for k in range(8):
        y = np.asarray(dihedral_transform(x, jnp.int32(k)))
        assert sorted(y.flatten()) == list(range(16))
        seen.add(tuple(y.flatten().tolist()))
    assert len(seen) == 8  # all 8 ops distinct


def test_random_dihedral_pairs_consistent():
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.normal(size=(4, 8, 8, 3)).astype(np.float32))
    noisy = gt + 1.0
    g2, n2 = random_dihedral_batch(jax.random.PRNGKey(0), gt, noisy)
    np.testing.assert_allclose(np.asarray(n2) - np.asarray(g2), 1.0, rtol=1e-6)


def test_mixup_convexity():
    rng = jax.random.PRNGKey(0)
    t = jnp.zeros((8, 4, 4, 3))
    i = jnp.ones((8, 4, 4, 3))
    t2, i2 = mixup_batch(rng, t, i)
    assert np.asarray(t2).min() >= 0 and np.asarray(t2).max() <= 1
    np.testing.assert_allclose(np.asarray(t2) + np.asarray(i2), 1.0, atol=1e-6)


def test_random_crop_pair_aligned():
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.normal(size=(16, 16, 3)).astype(np.float32))
    noisy = gt * 2
    g, n = random_crop_pair(jax.random.PRNGKey(3), gt, noisy, 8)
    assert g.shape == (8, 8, 3)
    np.testing.assert_allclose(np.asarray(n), np.asarray(g) * 2, rtol=1e-6)


def _make_state_and_step(model, spe=4):
    tx = make_optimizer(warmup_cosine_schedule(2e-3, 50, spe))
    x = jnp.zeros((4, 32, 32, 3))
    params = init_params_fast(model, x)
    state = TrainState.create(params, tx)
    step = make_train_step(model, mixup_after_epoch=5, steps_per_epoch=spe)
    return state, jax.jit(step)


@pytest.mark.slow
def test_train_step_reduces_loss():
    model = tiny_model()
    state, step = _make_state_and_step(model)
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32))
    noisy = jnp.clip(tgt + 0.1 * rng.normal(size=tgt.shape).astype(np.float32), 0, 1)
    batch = {"input": noisy, "target": tgt}
    losses = []
    for i in range(8):
        state, loss = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_eval_step_clamps():
    model = tiny_model()
    x = jnp.zeros((1, 32, 32, 3))
    params = init_params_fast(model, x)
    ev = jax.jit(make_eval_step(model))
    y = ev(params, jnp.full((1, 32, 32, 3), 2.0))
    assert np.asarray(y).max() <= 1.0 and np.asarray(y).min() >= 0.0


@pytest.mark.slow
def test_train_step_sharded_matches_single_device():
    """DP over the 8-device CPU mesh must be numerically identical to
    single-device execution (no mixup, deterministic rng)."""
    model = tiny_model(drop_path_rate=0.0)
    tx = make_optimizer(warmup_cosine_schedule(2e-3, 50, 4))
    x = jnp.zeros((8, 32, 32, 3))
    params = init_params_fast(model, x)
    step = make_train_step(model)  # no mixup
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32))
    batch = {"input": jnp.clip(tgt + 0.05, 0, 1), "target": tgt}

    state0 = TrainState.create(params, tx)
    _, loss_single = jax.jit(step)(state0, batch, jax.random.PRNGKey(0))

    mesh = make_mesh()
    bs = batch_sharding(mesh)
    sharded_batch = jax.device_put(batch, {"input": bs, "target": bs})
    from uformer_tpu.parallel import replicate
    state1 = TrainState.create(replicate(mesh, params), tx)
    with mesh:
        _, loss_sharded = jax.jit(step)(state1, sharded_batch,
                                        jax.random.PRNGKey(0))
    # cross-shard reduction order differs -> tiny float drift is expected
    np.testing.assert_allclose(float(loss_single), float(loss_sharded),
                               rtol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
