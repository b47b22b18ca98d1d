"""Block-fused window attention: modulator + qkv projection + attention +
output projection in one Pallas kernel.

The unfused path materializes q/k/v with head-split layout transposes in
HBM (the dominant 'copy' cost in profiles) plus the attention
intermediates. Here a tile of T windows (Bw, N, C) is read once; per head
the kernel computes q_h/k_h/v_h with MXU matmuls against pre-split weight
slices, runs logits -> rel-pos bias -> inline SW-MSA mask -> fp32 softmax
-> @v in VMEM, concatenates heads, applies the output projection, and
writes the single (T, N, C) result.

Covers reference model.py:966-969 (modulator add) + WindowAttention
forward (model.py:494-522) in one kernel.

Inputs:
  x:    (Bw, N, C)  windows after LN + cyclic shift + partition
  mod:  (N, C) learned modulator or None
  wq:   (nH, C, D), bq (nH, D)
  wk/wv: same (pre-split from the reference's to_kv)
  wo:   (C, C), bo (C,)
  bias: (nH, N, N) fp32 relative-position bias
Static: win/shift/H/W geometry for the inline mask, scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _region_ids(win, shift, size, w_idx, in_win):
    g = w_idx * win + in_win
    return ((g >= size - win).astype(jnp.int32)
            + (g >= size - shift).astype(jnp.int32))


def _make_kernel(T, N, C, nH, D, win, shift, H, W, scale, has_mod, has_ln,
                 out_dtype):
    nW_w = W // win
    nW = (H // win) * nW_w

    def kernel(x_ref, mod_ref, ln_s_ref, ln_b_ref, wq_ref, bq_ref, wk_ref,
               bk_ref, wv_ref, bv_ref, wo_ref, bo_ref, bias_ref, o_ref):
        xt = x_ref[0]  # (T, N, C) -> tokens (T*N, C)
        tok = xt.reshape(T * N, C)
        if has_ln:
            # LayerNorm folded in (eps matches torch); LN is per-token so
            # it commutes with the roll/partition done outside
            tf = tok.astype(jnp.float32)
            mu = tf.mean(-1, keepdims=True)
            var = tf.var(-1, keepdims=True)
            tf = (tf - mu) * jax.lax.rsqrt(var + 1e-5)
            tok = (tf * ln_s_ref[:].astype(jnp.float32)
                   + ln_b_ref[:].astype(jnp.float32)).astype(xt.dtype)
        if has_mod:
            tok = (tok.reshape(T, N, C)
                   + mod_ref[:][None].astype(tok.dtype)).reshape(T * N, C)
        prec = (jax.lax.Precision.HIGHEST
                if tok.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)

        if shift > 0:
            base = pl.program_id(0) * T
            widx = base + jax.lax.broadcasted_iota(jnp.int32, (T, N), 0)
            w_in_img = widx % nW
            wi = w_in_img // nW_w
            wj = w_in_img % nW_w
            n_off = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
            rh = _region_ids(win, shift, H, wi, n_off // win)
            rw = _region_ids(win, shift, W, wj, n_off % win)
            rid = rh * 3 + rw
            neq = (rid[:, :, None] != rid[:, None, :]).astype(jnp.float32)
            smask = neq * jnp.float32(-100.0)

        # accumulate the *projected* output per head (out = sum_h o_h @
        # Wo[hD:(h+1)D, :]) — no head concat, so only one head's
        # intermediates are live at a time
        out = jnp.zeros((T * N, C), jnp.float32)
        for h in range(nH):
            def proj(w_ref, b_ref):
                y = jax.lax.dot_general(
                    tok, w_ref[h],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
                return (y + b_ref[h].astype(jnp.float32)).astype(tok.dtype) \
                    .reshape(T, N, D)

            q = proj(wq_ref, bq_ref)
            k = proj(wk_ref, bk_ref)
            v = proj(wv_ref, bv_ref)
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec)
            logits = logits * scale + bias_ref[h][None]
            if shift > 0:
                logits = logits + smask
            probs = jax.nn.softmax(logits, axis=-1).astype(tok.dtype)
            o_h = jax.lax.dot_general(
                probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec,
            ).astype(tok.dtype)
            out = out + jax.lax.dot_general(
                o_h.reshape(T * N, D), wo_ref[h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        out = out + bo_ref[:].astype(jnp.float32)
        o_ref[0] = out.reshape(T, N, C).astype(out_dtype)

    return kernel


def _pick_tile(Bw, C, itemsize, budget=None):
    if budget is None:
        budget = (6 if itemsize <= 2 else 4) * 2**20
    # dominant: x tile (T,64,C) in/out double-buffered + fp32 out accum
    # (T*64, C) + fp32 logits/probs (T,64,128-padded)
    per_win = 64 * max(C, 128) * (2 * itemsize + 4) + 64 * 128 * 4 * 2
    t = max(min(budget // per_win, 256), 1)
    while Bw % t:
        t -= 1
    return t


def attention_block_reference(x, mod, ln_s, ln_b, wq, bq, wkv, bkv, wo, bo,
                              bias, *, win, shift, H, W, scale, num_heads,
                              has_ln=True):
    """jnp reference of the fused block (tests + backward pass)."""
    from uformer_tpu.ops.attention import _window_attention_jnp
    from uformer_tpu.ops.masks import shift_window_mask

    Bw, N, C = x.shape
    D = C // num_heads
    if has_ln:
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        x = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)
             * ln_s.astype(jnp.float32)
             + ln_b.astype(jnp.float32)).astype(x.dtype)
    xm = x + mod[None].astype(x.dtype)
    q = (xm @ wq.astype(x.dtype)) + bq.astype(x.dtype)
    kv = (xm @ wkv.astype(x.dtype)) + bkv.astype(x.dtype)
    q = q.reshape(Bw, N, num_heads, D).transpose(0, 2, 1, 3)
    k = kv[..., :C].reshape(Bw, N, num_heads, D).transpose(0, 2, 1, 3)
    v = kv[..., C:].reshape(Bw, N, num_heads, D).transpose(0, 2, 1, 3)
    mask = (jnp.asarray(shift_window_mask(H, W, win, shift))
            if shift > 0 else None)
    out = _window_attention_jnp(q, k, v, bias, mask, scale=scale)
    return (out @ wo.astype(x.dtype)) + bo.astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _ad_factory(win, shift, H, W, scale, num_heads, has_ln, interpret):
    """custom_vjp wrapper per static geometry: Pallas forward,
    reference-jnp VJP backward (rematerialized)."""
    kw = dict(win=win, shift=shift, H=H, W=W, scale=scale,
              num_heads=num_heads)

    @jax.custom_vjp
    def f(x, mod, ln_s, ln_b, wq, bq, wkv, bkv, wo, bo, bias):
        return fused_attention_block(x, mod, ln_s, ln_b, wq, bq, wkv, bkv,
                                     wo, bo, bias, has_ln=has_ln,
                                     interpret=interpret, **kw)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda *a: attention_block_reference(*a, has_ln=has_ln, **kw),
            *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_attention_block_ad(x, mod, ln_s, ln_b, wq, bq, wkv, bkv, wo, bo,
                             bias, *, win, shift, H, W, scale, num_heads,
                             has_ln=True, interpret=False):
    f = _ad_factory(win, shift, H, W, float(scale), num_heads, has_ln,
                    interpret)
    if mod is None:
        mod = jnp.zeros(x.shape[1:], x.dtype)
    if ln_s is None:
        ln_s = jnp.ones((x.shape[-1],), jnp.float32)
        ln_b = jnp.zeros((x.shape[-1],), jnp.float32)
    return f(x, mod, ln_s, ln_b, wq, bq, wkv, bkv, wo, bo, bias)


@functools.partial(jax.jit, static_argnames=(
    "win", "shift", "H", "W", "scale", "num_heads", "has_ln", "interpret"))
def fused_attention_block(x, mod, ln_s, ln_b, wq, bq, wkv, bkv, wo, bo,
                          bias, *, win, shift, H, W, scale, num_heads,
                          has_ln=True, interpret=False):
    """x: (Bw, N, C) pre-LN windows; wq: (C, C); wkv: (C, 2C);
    returns (Bw, N, C)."""
    Bw, N, C = x.shape
    nH = num_heads
    D = C // nH
    # pre-split weights per head: qkv (nH, C, D); wo (nH, D, C)
    wq_h = wq.reshape(C, nH, D).transpose(1, 0, 2)
    bq_h = bq.reshape(nH, D)
    wk = wkv[:, :C].reshape(C, nH, D).transpose(1, 0, 2)
    wv = wkv[:, C:].reshape(C, nH, D).transpose(1, 0, 2)
    bk = bkv[:C].reshape(nH, D)
    bv = bkv[C:].reshape(nH, D)
    wo_h = wo.reshape(nH, D, C)

    T = _pick_tile(Bw, C, x.dtype.itemsize)
    kernel = _make_kernel(T, N, C, nH, D, win, shift, H, W, scale,
                          mod is not None, has_ln, x.dtype)
    if mod is None:
        mod = jnp.zeros((N, C), x.dtype)
    if ln_s is None:
        ln_s = jnp.ones((C,), jnp.float32)
        ln_b = jnp.zeros((C,), jnp.float32)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(Bw // T,),
        in_specs=[
            pl.BlockSpec((1, T, N, C), lambda t: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
            vmem, vmem, vmem, vmem, vmem, vmem, vmem, vmem, vmem, vmem,
            vmem, vmem,
        ],
        out_specs=pl.BlockSpec((1, T, N, C), lambda t: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Bw, N, C), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Bw * N * C * (4 * C + 2 * N),
            bytes_accessed=2 * Bw * N * C * x.dtype.itemsize,
            transcendentals=Bw * nH * N * N,
        ),
    )(x[None], mod, ln_s, ln_b, wq_h, bq_h, wk, bk, wv, bv, wo_h, bo,
      bias.astype(jnp.float32))[0]
