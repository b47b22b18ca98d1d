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


def cyclic_shift_sharded(x, shift: int, axis_name: Optional[str]):
    """Global jnp.roll(x, -shift, axis=0) on an H-sharded (Hs, W, C) block:
    each shard passes its first `shift` rows to the previous shard.
    With axis_name=None the block is the full image (replicated stage) and
    this is a plain local roll."""
    if shift == 0:
        return x
    if axis_name is None:
        return jnp.roll(x, -shift, axis=0)
    head = jax.lax.ppermute(x[:shift], axis_name, _perm(axis_name, up=True))
    return jnp.concatenate([x[shift:], head], axis=0)


def cyclic_unshift_sharded(x, shift: int, axis_name: Optional[str]):
    if shift == 0:
        return x
    if axis_name is None:
        return jnp.roll(x, shift, axis=0)
    tail = jax.lax.ppermute(x[-shift:], axis_name, _perm(axis_name, up=False))
    return jnp.concatenate([tail, x[:-shift]], axis=0)


def halo_exchange(x, halo, axis_name: Optional[str], periodic: bool = False):
    """Extend (Hs, W, C) with neighbor rows -> (Hs + lo + hi, W, C).

    `halo` is an int (symmetric) or an (lo, hi) pair — e.g. the 4x4
    stride-2 Downsample conv needs (1, 2). Non-periodic edges get zeros
    (matching SAME/pad-1 zero padding). With axis_name=None (replicated
    stage holding the full image) this is plain zero padding.
    """
    lo, hi = (halo, halo) if isinstance(halo, int) else halo
    if axis_name is None:
        return jnp.pad(x, ((lo, hi), (0, 0), (0, 0)))
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    parts = []
    if lo:
        top = jax.lax.ppermute(x[-lo:], axis_name, _perm(axis_name, up=False))
        if not periodic:
            top = jnp.where(idx == 0, jnp.zeros_like(top), top)
        parts.append(top)
    parts.append(x)
    if hi:
        bot = jax.lax.ppermute(x[:hi], axis_name, _perm(axis_name, up=True))
        if not periodic:
            bot = jnp.where(idx == n - 1, jnp.zeros_like(bot), bot)
        parts.append(bot)
    return jnp.concatenate(parts, axis=0)


def dwconv_sharded(x, w, b, axis_name: Optional[str]):
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


def _use_pallas(backend: str) -> bool:
    from uformer_tpu.ops.attention import resolve_backend

    return resolve_backend(backend) == "pallas"


def _leff_sharded_fused(x, m, ln_s, ln_b, axis_name, interpret):
    """x + LeFF(LN(x)) on an H-sharded (Hs, W, C) shard through the fused
    Pallas kernel: 1-row halo exchange, kernel on the extended slab, crop.

    The kernel zero-pads its conv ring AFTER linear1+GELU (matching the
    unsharded model at true image edges), but halo_exchange fills
    global-edge halos with zero PIXELS, which LN+linear1+gelu would turn
    into a nonzero hidden row. Those two rows (global row 0 / H-1, on the
    first/last shard only) are recomputed locally with true edge
    semantics — a 2-row jnp pass."""
    from uformer_tpu.ops.dwconv import _depthwise_conv2d_jnp
    from uformer_tpu.ops.pallas.leff import fused_leff

    def hidden(rows):  # LN -> linear1 -> gelu on a few rows
        t = _layernorm(rows, ln_s, ln_b)
        h = t @ m["linear1_kernel"].astype(t.dtype) + \
            m["linear1_bias"].astype(t.dtype)
        return jax.nn.gelu(h, approximate=False)

    def edge_row(rows2, top: bool):
        # SAME dwconv on the 2-row slab zero-pads outside it — exactly
        # the kernel's ring at a true image edge
        h = hidden(rows2)
        y2 = _depthwise_conv2d_jnp(h[None], m["dwconv_kernel"],
                                   m["dwconv_bias"])[0]
        a = jax.nn.gelu(y2[0 if top else -1], approximate=False)
        return a @ m["linear2_kernel"].astype(a.dtype) + \
            m["linear2_bias"].astype(a.dtype)

    kw = dict(ln_s=jnp.asarray(ln_s, jnp.float32),
              ln_b=jnp.asarray(ln_b, jnp.float32),
              residual=False, interpret=interpret)
    args = (m["linear1_kernel"].astype(x.dtype), m["linear1_bias"],
            m["dwconv_kernel"].astype(x.dtype), m["dwconv_bias"],
            m["linear2_kernel"].astype(x.dtype), m["linear2_bias"])
    if axis_name is None:
        return x + fused_leff(x[None], *args, **kw)[0].astype(x.dtype)
    xh = halo_exchange(x, 1, axis_name)
    y = fused_leff(xh[None], *args, **kw)[0][1:-1].astype(x.dtype)
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    y = y.at[0].set(jnp.where(idx == 0, edge_row(x[:2], True), y[0]))
    y = y.at[-1].set(jnp.where(idx == n - 1, edge_row(x[-2:], False),
                               y[-1]))
    return x + y


def lewin_block_sharded(params, x, *, H: int, W: int, win: int, shift: int,
                        num_heads: int, axis_name: str = "data",
                        backend: str = "auto"):
    """Forward of one LeWin block on an H-sharded (Hs, W, C) shard,
    numerically equal to LeWinBlock.apply on the gathered image.

    params: the LeWinBlock param subtree (norm1/attn/norm2/mlp[/modulator]).
    Requires Hs % win == 0 and shift < win (the halo is at most one window
    row — the cheap-ICI property from SURVEY.md §5).

    backend="auto"/"pallas" routes the shard through the SAME fused Pallas
    kernels the single-chip path uses (VERDICT r3 item 5): windowed
    attention with the shard's global window offset threaded into the
    inline SW-MSA mask (`w_off`), and the fused LeFF on a 1-row-halo'd
    slab — so >1-chip images keep single-chip kernel speed. "jnp" keeps
    the plain XLA math (CPU tests, reference)."""
    p = params
    Hs = x.shape[0]
    assert Hs % win == 0 and 0 <= shift < win
    n_shard_rows = Hs // win
    C = x.shape[-1]
    D = C // num_heads

    use_pallas = _use_pallas(backend)
    interpret = jax.default_backend() != "tpu"

    wq = p["attn"]["qkv"]["to_q"]["kernel"]
    bq = p["attn"]["qkv"]["to_q"].get("bias", jnp.zeros(C))
    wkv = p["attn"]["qkv"]["to_kv"]["kernel"]
    bkv = p["attn"]["qkv"]["to_kv"].get("bias", jnp.zeros(2 * C))
    bias = gather_bias(
        p["attn"]["relative_position_bias_table"].astype(jnp.float32),
        win, win)

    shortcut = x
    if use_pallas:
        # LN folds into the kernel (it commutes with shift/partition)
        y = cyclic_shift_sharded(x, shift, axis_name)
    else:
        y = _layernorm(x, p["norm1"]["scale"], p["norm1"]["bias"])
        y = cyclic_shift_sharded(y, shift, axis_name)
    # local roll along W is shard-local
    if shift:
        y = jnp.roll(y, -shift, axis=1)

    xw = window_partition(y[None], win)[..., :]  # (nW_local, N, C)

    if use_pallas:
        from uformer_tpu.ops.pallas.attention_block import (
            fused_attention_block,
        )

        nW_w = W // win
        w_off = (0 if axis_name is None
                 else jax.lax.axis_index(axis_name) * n_shard_rows * nW_w)
        mod = p.get("modulator")
        out = fused_attention_block(
            xw, None if mod is None else mod.astype(xw.dtype),
            jnp.asarray(p["norm1"]["scale"], jnp.float32),
            jnp.asarray(p["norm1"]["bias"], jnp.float32),
            wq.astype(xw.dtype), bq.astype(xw.dtype),
            wkv.astype(xw.dtype), bkv.astype(xw.dtype),
            p["attn"]["proj"]["kernel"].astype(xw.dtype),
            p["attn"]["proj"]["bias"].astype(xw.dtype),
            bias, win=win, shift=shift, H=H, W=W, scale=D ** -0.5,
            num_heads=num_heads, has_ln=True, interpret=interpret,
            packed=False, w_off=w_off)
    else:
        if "modulator" in p:
            xw = xw + p["modulator"].astype(xw.dtype)[None]
        Bw, N, _ = xw.shape
        q = (xw @ wq.astype(xw.dtype) + bq.astype(xw.dtype)) \
            .reshape(Bw, N, num_heads, D)
        kv = (xw @ wkv.astype(xw.dtype) + bkv.astype(xw.dtype)) \
            .reshape(Bw, N, 2, num_heads, D)
        q = q.transpose(0, 2, 1, 3)
        k = kv[:, :, 0].transpose(0, 2, 1, 3)
        v = kv[:, :, 1].transpose(0, 2, 1, 3)
        mask = None
        if shift:
            full_mask = jnp.asarray(shift_window_mask(H, W, win, shift))
            if axis_name is None:
                mask = full_mask
            else:
                nW_w = W // win
                row0 = jax.lax.axis_index(axis_name) * n_shard_rows
                mask = jax.lax.dynamic_slice(
                    full_mask, (row0 * nW_w, 0, 0),
                    (n_shard_rows * nW_w, full_mask.shape[1],
                     full_mask.shape[2]))
        out = _window_attention_jnp(q, k, v, bias, mask, scale=D ** -0.5)
        out = out @ p["attn"]["proj"]["kernel"].astype(out.dtype) + \
            p["attn"]["proj"]["bias"].astype(out.dtype)

    y = window_reverse(out.astype(x.dtype), win, Hs, W)[0]
    if shift:
        y = jnp.roll(y, shift, axis=1)
    y = cyclic_unshift_sharded(y, shift, axis_name)
    x = shortcut + y

    # LeFF with halo'd depthwise conv
    m = p["mlp"]
    if use_pallas:
        return _leff_sharded_fused(
            x, m, p["norm2"]["scale"], p["norm2"]["bias"], axis_name,
            interpret)
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
                                      shift: int, num_heads: int,
                                      backend: str = "auto"):
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
                           axis_name="data", backend=backend)
    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P("data", None, None)),
        out_specs=P("data", None, None),
        check_vma=False,  # pallas_call inside needs vma checks off
    )
    img = jax.device_put(img, NamedSharding(mesh, P("data", None, None)))
    return sharded(params, img)


# ------------------------------------------- full-model sharded forward

def _conv_nhwc(x, w, b, *, strides=(1, 1), padding):
    """(H, W, Cin) conv with HWIO kernel -> (H', W', Cout)."""
    y = jax.lax.conv_general_dilated(
        x[None], w.astype(x.dtype), window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    return y + b.astype(y.dtype)


def conv3x3_sharded(x, w, b, axis_name: Optional[str]):
    """3x3 stride-1 SAME conv on an H-sharded (Hs, W, C) block (used by
    Input/OutputProj — reference model.py:781-846): 1-row halo, local W pad."""
    xh = halo_exchange(x, 1, axis_name)
    return _conv_nhwc(xh, w, b, padding=((0, 0), (1, 1)))


def downsample_sharded(x, w, b, axis_name: Optional[str]):
    """4x4 stride-2 pad-1 conv (reference Downsample, model.py:730-753) on
    an H-sharded block. Output row j reads input rows 2j-1..2j+2, so a
    shard owning output rows [a, b) needs input rows [2a-1, 2b+2): halo
    (1, 2). Requires Hs even."""
    assert x.shape[0] % 2 == 0
    xh = halo_exchange(x, (1, 2), axis_name)
    return _conv_nhwc(xh, w, b, strides=(2, 2), padding=((0, 0), (1, 1)))


def upsample_local(x, w, b):
    """2x2 stride-2 ConvTranspose (reference Upsample, model.py:756-778).
    Output rows 2i, 2i+1 depend only on input row i — no halo needed, so
    the sharded and replicated cases are the same local op. Kernel layout
    matches flax ConvTranspose(transpose_kernel=True): (2, 2, Cout, Cin)."""
    y = jax.lax.conv_transpose(
        x[None], w.astype(x.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)[0]
    return y + b.astype(y.dtype)


def _leaky_relu(x):
    return jnp.where(x >= 0, x, 0.01 * x)


def _stage_geometry(reso: int, win: int, shift_flag: bool, depth: int):
    """Mirror BasicLayer's construction-time win/shift adjustment
    (reference model.py:863-865): per-block (win, shift) pairs."""
    out = []
    for i in range(depth):
        shift = 0 if (not shift_flag or i % 2 == 0) else win // 2
        if reso <= win:
            out.append((min(reso, win), 0))
        else:
            out.append((win, shift))
    return out


def uformer_forward_sharded(params, x, model, *, n_shards: int,
                            axis_name: str = "data",
                            backend: str = "auto"):
    """Full Uformer forward on one (H, W, C) image H-sharded over
    `axis_name` — numerically equal to `model.apply` on the gathered image.

    Runs inside shard_map; `x` is this shard's (Hs, W, C) rows. Halo rules:
    3x3 convs and LeFF dwconv exchange 1 row, Downsample 4x4s2 exchanges
    (1, 2), Upsample 2x2s2 is halo-free; the SW-MSA cyclic roll is a
    `shift`-row ppermute. Skip concats are channel-wise, hence shard-local.

    Stages whose per-shard height would drop below one window row (the
    deep/bottleneck levels, H/16) are computed replicated: one tiled
    all_gather on the way down, a local row-slice re-scatter on the way up
    — the FLOPs there are 1/256th of level 0, so duplicate compute is
    cheaper than fine-grained comms. Level-k shardability: (H >> k) must
    split into n_shards x (multiple of win) rows.

    Covers the shipped arch space: token_projection='linear',
    token_mlp='leff'/'fastleff', optional decoder modulator
    (cross_modulator and input masks are not supported here).
    """
    if model.token_projection != "linear":
        raise NotImplementedError("sharded forward: linear projection only")
    if model.token_mlp not in ("leff", "fastleff"):
        raise NotImplementedError("sharded forward: leff/fastleff only")
    if model.cross_modulator:
        raise NotImplementedError("sharded forward: no cross_modulator")

    H = x.shape[0] * n_shards
    W = x.shape[1]
    win = model.win_size
    depths = list(model.depths)
    heads = list(model.num_heads)
    E = model.embed_dim

    def level_sharded(k):
        Hk = H >> k
        reso = max(model.img_size >> k, 1)
        wk = min(reso, win)
        return Hk % n_shards == 0 and (Hk // n_shards) % wk == 0

    def ensure(y, cur: bool, want: bool):
        """Move y between sharded (Hs, W, C) and replicated (H, W, C)."""
        if cur == want:
            return y
        if cur and not want:
            return jax.lax.all_gather(y, axis_name, axis=0, tiled=True)
        rows = y.shape[0] // n_shards
        row0 = jax.lax.axis_index(axis_name) * rows
        return jax.lax.dynamic_slice(
            y, (row0, 0, 0), (rows, y.shape[1], y.shape[2]))

    def run_stage(p, y, k_level: int, depth: int, n_heads: int,
                  sharded: bool, modulator: bool):
        ax = axis_name if sharded else None
        Hk = H >> k_level
        reso = max(model.img_size >> k_level, 1)
        for i, (wi, si) in enumerate(
                _stage_geometry(reso, win, model.shift_flag, depth)):
            bp = p[f"blocks_{i}"]
            assert modulator == ("modulator" in bp)
            y = lewin_block_sharded(
                bp, y, H=Hk, W=W >> k_level, win=wi, shift=si,
                num_heads=n_heads, axis_name=ax, backend=backend)
        return y

    sharded = [level_sharded(k) for k in range(5)]
    cur = True  # input arrives H-sharded

    y = ensure(x, cur, sharded[0])
    cur = sharded[0]
    y = _leaky_relu(conv3x3_sharded(
        y, params["input_proj"]["proj"]["kernel"],
        params["input_proj"]["proj"]["bias"],
        axis_name if cur else None))

    skips = []
    for k in range(4):
        y = run_stage(params[f"encoderlayer_{k}"], y, k, depths[k],
                      heads[k], cur, modulator=False)
        skips.append((y, cur))
        y = downsample_sharded(
            y, params[f"dowsample_{k}"]["conv"]["kernel"],
            params[f"dowsample_{k}"]["conv"]["bias"],
            axis_name if cur else None)
        y = ensure(y, cur, sharded[k + 1])
        cur = sharded[k + 1]

    y = run_stage(params["conv"], y, 4, depths[4], heads[4], cur,
                  modulator=False)

    for k in range(4):
        lvl = 3 - k
        y = ensure(y, cur, sharded[lvl])  # halo-free up: scatter first
        cur = sharded[lvl]
        up = upsample_local(
            y, params[f"upsample_{k}"]["deconv"]["kernel"],
            params[f"upsample_{k}"]["deconv"]["bias"])
        skip, skip_sharded = skips[lvl]
        skip = ensure(skip, skip_sharded, cur)
        y = jnp.concatenate([up, skip], axis=-1)
        y = run_stage(params[f"decoderlayer_{k}"], y, lvl, depths[5 + k],
                      heads[5 + k], cur, modulator=model.modulator)

    y = conv3x3_sharded(
        y, params["output_proj"]["proj"]["kernel"],
        params["output_proj"]["proj"]["bias"],
        axis_name if cur else None)
    y = ensure(y, cur, True)
    if model.dd_in == 3:
        y = x.astype(jnp.float32) + y.astype(jnp.float32)
    return y


def run_uformer_spatially_sharded(params, img, mesh: Mesh, model, *,
                                  pad: bool = True,
                                  backend: str = "auto"):
    """Drive the FULL Uformer forward over a (B, H, W, C) batch (or a
    single (H, W, C) image) sharded over the mesh's 'data' axis. The whole
    U-graph — convs, windows, shifts, skips — runs distributed with halo
    exchange; only the sub-window-row deep levels are replicated (see
    uformer_forward_sharded). Batches vmap the shard_map body (the
    collectives broadcast over the batch dim).

    With pad=True (default) arbitrary H/W are accepted: the image is
    zero-padded bottom/right to the divisibility the sharded U-graph
    needs — the same protocol `eval.padding.pad_to_multiple` applies for
    the unsharded model (reference test scripts pad to a multiple of 128)
    — and the output is cropped back. Equality contract: equals
    `model.apply` on the identically padded image, cropped."""
    import math

    from jax import shard_map

    if img.ndim == 3:
        img = img[None]
    B, H, W = img.shape[:3]
    n = mesh.shape["data"]
    win = model.win_size
    # level-0 sharding needs H % (n*win) == 0; the (unsharded) U-graph
    # itself needs both sides divisible by 16*win (4 stride-2 levels,
    # whole windows at the bottleneck)
    h_factor = math.lcm(16 * win, n * win)
    w_factor = 16 * win
    Hp = -(-H // h_factor) * h_factor
    Wp = -(-W // w_factor) * w_factor
    if (Hp, Wp) != (H, W):
        if not pad:
            raise ValueError(
                f"H={H}, W={W} must be divisible by lcm(16*win, n*win)="
                f"{h_factor} / 16*win={w_factor}; pass pad=True to pad "
                "internally")
        img = jnp.pad(img, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))

    p = params.get("params", params)
    fn = functools.partial(uformer_forward_sharded, model=model,
                           n_shards=n, axis_name="data",
                           backend=backend)
    if B > 1:
        fn = jax.vmap(fn, in_axes=(None, 0))
        specs = (P(), P(None, "data", None, None))
    else:
        specs = (P(), P("data", None, None))
    sharded = shard_map(
        fn, mesh=mesh, in_specs=specs,
        out_specs=specs[1],
        check_vma=False,  # pallas_call inside needs vma checks off
    )
    imgs = img if B > 1 else img[0]
    imgs = jax.device_put(imgs, NamedSharding(mesh, specs[1]))
    out = sharded(p, imgs)
    out = out if B > 1 else out[None]
    return out[:, :H, :W]


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
