"""Spatial parallelism: halo exchange, sharded LeWin block parity,
sharded tiled inference — on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from uformer_tpu.models.layers import LeWinBlock
from uformer_tpu.parallel import make_mesh
from uformer_tpu.parallel.spatial import (
    run_lewin_block_spatially_sharded,
    tiled_inference_sharded,
)
from uformer_tpu.utils import init_params_fast


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


def test_tiled_inference_sharded_identity():
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 100, 180, 3)).astype(np.float32)
    out = tiled_inference_sharded(lambda x: x, img, mesh, tile=64,
                                  overlap=16, factor=32)
    np.testing.assert_allclose(out, img, atol=1e-6)
