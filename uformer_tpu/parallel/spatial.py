"""Spatial (sequence) parallelism: H-axis sharding with halo exchange.

The reference handles large images only by padding or offline patching
(SURVEY.md §5); scaling beyond one chip was out of scope. Window attention
makes spatial sharding cheap: attention is local to win×win windows, so an
image sharded over H needs only
  * a periodic ppermute of `shift` rows for the SW-MSA cyclic roll, and
  * a 1-row halo exchange for the LeFF depthwise conv —
never ring attention. This module provides those primitives, a fully
functional spatially-sharded LeWin block (consumes standard LeWinBlock
params), and an embarrassingly-parallel sharded tiled-inference driver
for arbitrary-size images.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uformer_tpu.ops import (
    window_partition,
    window_reverse,
)
from uformer_tpu.ops.attention import _window_attention_jnp
from uformer_tpu.ops.masks import shift_window_mask
from uformer_tpu.ops.relpos import gather_bias


# ------------------------------------------------------------ primitives

def _perm(axis_name: str, up: bool):
    n = jax.lax.axis_size(axis_name)
    if up:  # send to previous shard (row index decreases)
        return [(i, (i - 1) % n) for i in range(n)]
    return [(i, (i + 1) % n) for i in range(n)]


def cyclic_shift_sharded(x, shift: int, axis_name: str):
    """Global jnp.roll(x, -shift, axis=0) on an H-sharded (Hs, W, C) block:
    each shard passes its first `shift` rows to the previous shard."""
    if shift == 0:
        return x
    head = jax.lax.ppermute(x[:shift], axis_name, _perm(axis_name, up=True))
    return jnp.concatenate([x[shift:], head], axis=0)


def cyclic_unshift_sharded(x, shift: int, axis_name: str):
    if shift == 0:
        return x
    tail = jax.lax.ppermute(x[-shift:], axis_name, _perm(axis_name, up=False))
    return jnp.concatenate([tail, x[:-shift]], axis=0)


def halo_exchange(x, halo: int, axis_name: str, periodic: bool = False):
    """Extend (Hs, W, C) with `halo` rows from both neighbors ->
    (Hs + 2*halo, W, C). Non-periodic edges get zeros (matching SAME
    zero padding)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = jax.lax.ppermute(x[-halo:], axis_name, _perm(axis_name, up=False))
    bot = jax.lax.ppermute(x[:halo], axis_name, _perm(axis_name, up=True))
    if not periodic:
        top = jnp.where(idx == 0, jnp.zeros_like(top), top)
        bot = jnp.where(idx == n - 1, jnp.zeros_like(bot), bot)
    return jnp.concatenate([top, x, bot], axis=0)


def dwconv_sharded(x, w, b, axis_name: str):
    """Depthwise 3x3 SAME on an H-sharded (Hs, W, C) block via 1-row halo."""
    from uformer_tpu.ops.dwconv import _depthwise_conv2d_jnp

    xh = halo_exchange(x, 1, axis_name)  # (Hs+2, W, C)
    out = _depthwise_conv2d_jnp(xh[None], w, b)[0]
    return out[1:-1]


# --------------------------------------------------- sharded LeWin block

def _layernorm(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def lewin_block_sharded(params, x, *, H: int, W: int, win: int, shift: int,
                        num_heads: int, axis_name: str = "data"):
    """Forward of one LeWin block on an H-sharded (Hs, W, C) shard,
    numerically equal to LeWinBlock.apply on the gathered image.

    params: the LeWinBlock param subtree (norm1/attn/norm2/mlp[/modulator]).
    Requires Hs % win == 0 and shift < win (the halo is at most one window
    row — the cheap-ICI property from SURVEY.md §5).
    """
    p = params
    Hs = x.shape[0]
    assert Hs % win == 0 and 0 <= shift < win
    n_shard_rows = Hs // win
    C = x.shape[-1]
    D = C // num_heads

    shortcut = x
    y = _layernorm(x, p["norm1"]["scale"], p["norm1"]["bias"])
    y = cyclic_shift_sharded(y, shift, axis_name)
    # local roll along W is shard-local
    if shift:
        y = jnp.roll(y, -shift, axis=1)

    xw = window_partition(y[None], win)[..., :]  # (nW_local, N, C)
    if "modulator" in p:
        xw = xw + p["modulator"].astype(xw.dtype)[None]

    # qkv (LinearProjection layout)
    wq = p["attn"]["qkv"]["to_q"]["kernel"].astype(xw.dtype)
    bq = p["attn"]["qkv"]["to_q"].get("bias", jnp.zeros(C))
    wkv = p["attn"]["qkv"]["to_kv"]["kernel"].astype(xw.dtype)
    bkv = p["attn"]["qkv"]["to_kv"].get("bias", jnp.zeros(2 * C))
    Bw, N, _ = xw.shape
    q = (xw @ wq + bq.astype(xw.dtype)).reshape(Bw, N, num_heads, D)
    kv = (xw @ wkv + bkv.astype(xw.dtype)).reshape(Bw, N, 2, num_heads, D)
    q = q.transpose(0, 2, 1, 3)
    k = kv[:, :, 0].transpose(0, 2, 1, 3)
    v = kv[:, :, 1].transpose(0, 2, 1, 3)

    bias = gather_bias(
        p["attn"]["relative_position_bias_table"].astype(jnp.float32),
        win, win)
    mask = None
    if shift:
        full_mask = jnp.asarray(shift_window_mask(H, W, win, shift))
        nW_w = W // win
        row0 = jax.lax.axis_index(axis_name) * n_shard_rows
        mask = jax.lax.dynamic_slice(
            full_mask, (row0 * nW_w, 0, 0),
            (n_shard_rows * nW_w, full_mask.shape[1], full_mask.shape[2]))
    out = _window_attention_jnp(q, k, v, bias, mask, scale=D ** -0.5)
    out = out @ p["attn"]["proj"]["kernel"].astype(out.dtype) + \
        p["attn"]["proj"]["bias"].astype(out.dtype)

    y = window_reverse(out, win, Hs, W)[0]
    if shift:
        y = jnp.roll(y, shift, axis=1)
    y = cyclic_unshift_sharded(y, shift, axis_name)
    x = shortcut + y

    # LeFF with halo'd depthwise conv
    m = p["mlp"]
    y = _layernorm(x, p["norm2"]["scale"], p["norm2"]["bias"])
    y = y @ m["linear1_kernel"].astype(y.dtype) + \
        m["linear1_bias"].astype(y.dtype)
    y = jax.nn.gelu(y, approximate=False)
    y = dwconv_sharded(y, m["dwconv_kernel"], m["dwconv_bias"], axis_name)
    y = jax.nn.gelu(y, approximate=False)
    y = y @ m["linear2_kernel"].astype(y.dtype) + \
        m["linear2_bias"].astype(y.dtype)
    return x + y


def run_lewin_block_spatially_sharded(params, img, mesh: Mesh, *, win: int,
                                      shift: int, num_heads: int):
    """Drive one LeWin block over an (H, W, C) image sharded over the
    mesh's 'data' axis (H split across devices)."""
    from jax import shard_map

    H, W, C = img.shape
    n = mesh.shape["data"]
    assert H % (n * win) == 0, (
        f"H={H} must be divisible by n_shards*win = {n}*{win} = {n * win} "
        f"so each shard holds whole window rows")

    fn = functools.partial(lewin_block_sharded, H=H, W=W, win=win,
                           shift=shift, num_heads=num_heads,
                           axis_name="data")
    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P("data", None, None)),
        out_specs=P("data", None, None),
    )
    img = jax.device_put(img, NamedSharding(mesh, P("data", None, None)))
    return sharded(params, img)


# ------------------------------------------------ sharded tiled inference

def tiled_inference_sharded(fn, img: np.ndarray, mesh: Mesh, tile: int = 256,
                            overlap: int = 32, factor: int = 128,
                            margin: Optional[int] = None) -> np.ndarray:
    """Overlapping-crop inference with the tile batch sharded over the
    mesh's 'data' axis — each device restores a slice of the tiles
    (embarrassingly parallel; the blend happens on host).

    `fn` must accept a (B, tile, tile, C) batch.
    """
    if margin is None:
        margin = overlap // 4
    B, H, W, C = img.shape
    assert B == 1, "sharded tiling drives one image at a time"
    step = tile - overlap
    ys = sorted({min(y, max(H - tile, 0))
                 for y in range(0, max(H - overlap, 1), step)})
    xs = sorted({min(x, max(W - tile, 0))
                 for x in range(0, max(W - overlap, 1), step)})
    coords = [(y, x) for y in ys for x in xs]

    n = mesh.shape["data"]
    pad_n = (-len(coords)) % n
    coords_p = coords + [coords[-1]] * pad_n
    tiles = np.stack([
        np.pad(img[0, y:y + tile, x:x + tile],
               ((0, max(0, tile - (H - y))), (0, max(0, tile - (W - x))),
                (0, 0)))
        for (y, x) in coords_p])

    sharding = NamedSharding(mesh, P("data", None, None, None))
    with mesh:
        out_tiles = np.asarray(fn(jax.device_put(tiles, sharding)))

    from uformer_tpu.eval.padding import _blend_window

    acc = np.zeros((H, W, C), np.float32)
    wsum = np.zeros((H, W, 1), np.float32)
    ramp = overlap - 2 * margin
    for (y, x), out in zip(coords, out_tiles):
        th = min(tile, H - y)
        tw = min(tile, W - x)
        y0 = margin if y > 0 else 0
        y1 = th - margin if y + th < H else th
        x0 = margin if x > 0 else 0
        x1 = tw - margin if x + tw < W else tw
        wy = _blend_window(y1 - y0, ramp, y > 0, y + th < H)
        wx = _blend_window(x1 - x0, ramp, x > 0, x + tw < W)
        w = wy[:, None] * wx[None, :]
        acc[y + y0:y + y1, x + x0:x + x1] += out[y0:y1, x0:x1] * w[..., None]
        wsum[y + y0:y + y1, x + x0:x + x1] += w[..., None]
    assert float(wsum.min()) > 0
    return (acc / wsum)[None]
