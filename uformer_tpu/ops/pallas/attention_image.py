"""Image-layout fused window attention: the whole LeWin attention sub-block
(LN -> cyclic shift -> window partition -> modulator -> W-MSA/SW-MSA ->
output projection -> window reverse -> unshift -> residual add) in ONE
Pallas kernel that reads and writes the (B, H, W, C) image directly.

Covers reference `model.py:941-975` (LeWinTransformerBlock.forward through
`x = shortcut + self.drop_path(attn_windows...)`) for the deterministic
path, and the same WindowAttention math as
`uformer_tpu.ops.pallas.attention_block` (model.py:494-522).

Why image layout (vs the windowed kernel in attention_block.py):
  * The XLA glue this replaces — LayerNorm pass, two jnp.roll, window
    partition/reverse copies, residual add — is pure HBM traffic, ~14 ms
    of a 50 ms Uformer_B forward at 256². Here it all happens on
    VMEM-resident tiles.
  * On TPU the (R, W, C) tile keeps (W, C) as the tiled (sublane, lane)
    pair and rows as the untiled outer dim, so EVERY restructuring step is
    layout-free register renaming for C a lane multiple:
      - halo/row concat and per-window-row slicing: outer dim
      - window partition (8, W, C) -> (W/8, 64, C): sublane split at vreg
        granularity + outer transpose + outer/sublane merge
      - cyclic shift: row shift is outer indexing; the W shift is a single
        hardware sublane rotate (jnp.roll axis=1)
    The lane dim is never touched, so this path requires C % 128 == 0
    (narrow C would force an unsupported lane<->sublane relayout;
    those stages keep the windowed kernel).
  * SW-MSA: each tile recomputes one halo window-row ((R/8+1)/(R/8)
    overhead) so its OUTPUT block stays aligned to image rows — the
    shift never materializes anywhere.

Weights arrive pre-split per head GROUP of hg = 128//D heads exactly as in
attention_block.py (full-lane MXU projections).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uformer_tpu.ops.pallas.attention_block import _perm_assemble, _region_ids


def _winchain(rows8, W, C):
    """(8, W, C) -> (W/8, 64, C): batch of this window-row's windows.
    Free on TPU: sublane split at 8-granularity, outer transpose, merge."""
    W8 = W // 8
    y = rows8.reshape(8, W8, 8, C).transpose(1, 0, 2, 3)
    return y.reshape(W8, 64, C)


def _winchain_inv(wins, W, C):
    """(W/8, 64, C) -> (8, W, C). Inverse of :func:`_winchain`."""
    W8 = W // 8
    y = wins.reshape(W8, 8, 8, C).transpose(1, 0, 2, 3)
    return y.reshape(8, W, C)


@functools.lru_cache(maxsize=None)
def _make_kernel(R, H, W, C, nH, D, hg, g, scale, shift, has_mod, has_ln,
                 residual, out_dtype):
    """One kernel per static geometry. R rows per tile (R % 8 == 0, R | H).
    shift > 0 processes R/8 + 1 window-rows per tile (one halo row)."""
    s = shift
    kR = R // 8
    nB8 = H // 8
    W8 = W // 8
    nK = kR + (1 if s else 0)
    T = nK * W8          # windows per tile
    P = g * 64           # tokens per paired-window group
    nG = nH // hg

    def attn_core(t, tok, mod_ref, wq_ref, bq_ref, wkv_ref, bkv_ref,
                  wo_ref, bo_ref, bias_ref):
        """tok: (T*64, C) post-LN tokens -> (T*64, C) projected output."""
        if has_mod:
            tok = (tok.reshape(T, 64, C)
                   + mod_ref[:][None].astype(tok.dtype)).reshape(T * 64, C)
        prec = (jax.lax.Precision.HIGHEST
                if tok.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)

        # additive mask: local window id isolates paired windows; for
        # SW-MSA the shift regions fold into the same region id
        # (reference model.py:922-940 as index arithmetic)
        rows = jax.lax.broadcasted_iota(jnp.int32, (T // g, P), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T // g, P), 1)
        wloc = rows * g + cols // 64
        if s:
            n_off = cols % 64
            k_idx = wloc // W8
            j_idx = wloc - k_idx * W8
            gwr = jax.lax.rem(t * kR - 1 + k_idx + nB8, nB8)
            rh = _region_ids(8, s, H, gwr, n_off // 8)
            rw = _region_ids(8, s, W, j_idx, n_off % 8)
            rid = wloc * 9 + rh * 3 + rw
        else:
            rid = wloc
        if s or g > 1:
            neq = (rid[:, :, None] != rid[:, None, :]).astype(jnp.float32)
            smask = neq * jnp.float32(-100.0)
        else:
            smask = None

        out = jnp.zeros((T * 64, C), jnp.float32)
        for gi in range(nG):
            # head-group weights are lane slices of the raw (C, C) /
            # (C, 2C) projection matrices — no outer transpose pass
            g0 = gi * hg * D

            def proj(w_ref, b_ref, c0, mul=None):
                y = jax.lax.dot_general(
                    tok, w_ref[:, c0:c0 + hg * D],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
                y = y + b_ref[0, c0:c0 + hg * D].astype(jnp.float32)
                if mul is not None:  # fold the softmax scale into q
                    y = y * mul
                return y.astype(tok.dtype)

            qg = proj(wq_ref, bq_ref, g0, jnp.float32(scale))
            kg = proj(wkv_ref, bkv_ref, g0)
            vg = proj(wkv_ref, bkv_ref, C + g0)
            o_parts = []
            for hh in range(hg):
                h = gi * hg + hh
                sl = slice(hh * D, (hh + 1) * D)
                q = qg[:, sl].reshape(T // g, P, D)
                k = kg[:, sl].reshape(T // g, P, D)
                v = vg[:, sl].reshape(T // g, P, D)
                bias_h = bias_ref[h]  # (64, 64) fp32
                if g > 1:
                    bias_h = jnp.concatenate([bias_h] * g, axis=-1)
                    bias_h = jnp.concatenate([bias_h] * g, axis=-2)
                logits = jax.lax.dot_general(
                    q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=prec)
                logits = logits + bias_h[None]
                if smask is not None:
                    logits = logits + smask
                if out_dtype == jnp.bfloat16:
                    # skip the max-subtraction reduce — post-LN logits
                    # are bounded far below exp's f32 overflow (clamped
                    # at 80 for safety; masked lanes are -100)
                    e = jnp.exp(jnp.minimum(logits, jnp.float32(80.0)))
                    probs = (e / e.sum(-1, keepdims=True)).astype(tok.dtype)
                else:
                    probs = jax.nn.softmax(logits, axis=-1) \
                        .astype(tok.dtype)
                o_parts.append(jax.lax.dot_general(
                    probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=prec,
                ).astype(tok.dtype))
            og = (o_parts[0] if hg == 1
                  else jnp.concatenate(o_parts, axis=-1))
            out = out + jax.lax.dot_general(
                og.reshape(T * 64, hg * D), wo_ref[g0:g0 + hg * D, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        return out + bo_ref[:].astype(jnp.float32)

    def kernel(*refs):
        if s:
            (xm_ref, xa_ref, xb_ref, mod_ref, ln_s_ref, ln_b_ref,
             wq_ref, bq_ref, wkv_ref, bkv_ref,
             wo_ref, bo_ref, bias_ref, o_ref) = refs
        else:
            (xm_ref, mod_ref, ln_s_ref, ln_b_ref,
             wq_ref, bq_ref, wkv_ref, bkv_ref,
             wo_ref, bo_ref, bias_ref, o_ref) = refs
        t = pl.program_id(1)
        xm = xm_ref[0]
        if s:
            # halo rows + cyclic shift: rows via outer-dim assembly, the
            # W axis via one hardware sublane rotate
            slab = jnp.concatenate([xa_ref[0], xm, xb_ref[0]], axis=0)
            slab = jnp.roll(slab, -s, axis=1)
        else:
            slab = xm
        if has_ln:
            sf = slab.astype(jnp.float32)
            mu = sf.mean(-1, keepdims=True)
            var = sf.var(-1, keepdims=True)
            slab = ((sf - mu) * jax.lax.rsqrt(var + 1e-5)
                    * ln_s_ref[:].astype(jnp.float32)
                    + ln_b_ref[:].astype(jnp.float32)).astype(slab.dtype)

        # partition all of this tile's window-rows (free reshapes)
        tok = jnp.concatenate(
            [_winchain(slab[8 * k + s:8 * k + s + 8], W, C)
             for k in range(nK)], axis=0).reshape(T * 64, C)

        out = attn_core(t, tok, mod_ref, wq_ref, bq_ref, wkv_ref,
                        bkv_ref, wo_ref, bo_ref, bias_ref)
        out = out.astype(xm.dtype).reshape(T, 64, C)

        # reverse: windows -> image rows, keeping each tile's aligned span
        rows_k = [_winchain_inv(out[k * W8:(k + 1) * W8], W, C)
                  for k in range(nK)]
        if s:
            body = [rows_k[0][8 - s:]] + rows_k[1:kR] + [rows_k[kR][:8 - s]]
            res = jnp.concatenate(body, axis=0)
            res = jnp.roll(res, s, axis=1)  # un-shift W
        else:
            res = jnp.concatenate(rows_k, axis=0) if nK > 1 else rows_k[0]
        if residual:
            res = xm + res
        o_ref[0] = res

    return kernel


def _perm_indices(p: int):
    """Within-window token permutation of the packed attention core.

    Packed layout: p adjacent W-pixels share one 128-lane column, pixel
    slot i at lanes [i*C, (i+1)*C). A window (8x8 tokens) is (K, 128)
    packed rows with K = 64/p, packed row j = r*(8/p) + pc. The packed
    core assembles per-head q/k/v by lane-slicing each slot and
    concatenating slot blocks on sublanes, which yields tokens in PERM
    order a = i*K + j. This returns pi with pi[a] = true token index
    r*8 + pc*p + i, used to pre-permute the rel-pos bias host-side."""
    import numpy as np

    K = 64 // p
    wp8 = 8 // p
    a = np.arange(64)
    i, j = a // K, a % K
    r, pc = j // wp8, j % wp8
    return r * 8 + pc * p + i


@functools.lru_cache(maxsize=None)
def _make_packed_kernel(R, H, W, C, p, nH, D, g, scale, shift, has_mod,
                        has_ln, residual, out_dtype):
    """Pixel-packed image-layout attention for narrow C (C*p == 128).

    Reads/writes the image in the FREE packed view (B, H, W/p, 128) —
    full 128-lane rows where the unpacked layout pays the narrow-lane
    DMA penalty (leff.py docstring: measured 10-30x on C=32 rows). All
    wide passes (LN via MXU group-mean, kron-expanded q/kv/o projections,
    modulator/bias adds, rolls, window chains) stay packed; only the
    per-head attention core runs on (P, D) blocks, assembled by slot
    lane-slices + sublane concats (never a lane<->sublane reshape).
    The W-axis cyclic shift is a roll by shift/p packed columns
    (requires p | shift; p in {2,4} and shift in {0,4} always satisfy)."""
    s = shift
    sp = s // p if s else 0
    kR = R // 8
    nB8 = H // 8
    Wp = W // p          # packed columns per row
    wp8 = 8 // p         # packed columns per window
    K = 64 // p          # packed rows per window
    W8 = W // 8          # windows per row
    nK = kR + (1 if s else 0)
    T = nK * W8
    P = g * 64           # perm tokens per paired-window group
    CP = p * C           # 128
    f32 = jnp.float32

    from uformer_tpu.ops.pallas.leff import _packed_helpers
    _, ln_apply, _, _, _ = _packed_helpers(Wp, CP, CP, p, has_ln, out_dtype)

    def winchain_p(rows8):
        y = rows8.reshape(8, W8, wp8, CP).transpose(1, 0, 2, 3)
        return y.reshape(W8, K, CP)

    def winchain_p_inv(wins):
        y = wins.reshape(W8, 8, wp8, CP).transpose(1, 0, 2, 3)
        return y.reshape(8, Wp, CP)

    def attn_core(t, tok, mod_ref, wq_ref, bq_ref, wkv_ref, bkv_ref,
                  wo_ref, bo_ref, bias_ref):
        """tok: (T*K, 128) post-LN packed tokens -> (T*K, 128) f32."""
        if has_mod:
            tok = (tok.reshape(T, K, CP)
                   + mod_ref[:][None].astype(tok.dtype)).reshape(T * K, CP)
        prec = (jax.lax.Precision.HIGHEST
                if tok.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)

        # additive mask in PERM token coordinates (see _perm_indices)
        rows = jax.lax.broadcasted_iota(jnp.int32, (T // g, P), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T // g, P), 1)
        wloc = rows * g + cols // 64
        if s:
            a = cols % 64
            in_r = (a % K) // wp8
            in_c = (a % wp8) * p + a // K
            k_idx = wloc // W8
            j_idx = wloc - k_idx * W8
            gwr = jax.lax.rem(t * kR - 1 + k_idx + nB8, nB8)
            rh = _region_ids(8, s, H, gwr, in_r)
            rw = _region_ids(8, s, W, j_idx, in_c)
            rid = wloc * 9 + rh * 3 + rw
        else:
            rid = wloc
        if s or g > 1:
            neq = (rid[:, :, None] != rid[:, None, :]).astype(f32)
            smask = neq * jnp.float32(-100.0)
        else:
            smask = None

        def proj(w_ref, b_ref, mul=None):
            y = jax.lax.dot_general(
                tok, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec)
            y = y + b_ref[0].astype(f32)
            if mul is not None:  # fold the softmax scale into q
                y = y * mul
            return y.astype(tok.dtype)

        qg = proj(wq_ref, bq_ref, jnp.float32(scale))   # (T*K, 128)
        kvg = proj(wkv_ref, bkv_ref)                    # (T*K, 256)

        def perm_head(src, base):
            """Per-head (T//g, P, D) from packed lanes (perm order
            a = i*K + j) via the lane-roll assembler — see
            attention_block._perm_assemble for why the naive slice +
            sublane-concat does not compile under Mosaic."""
            return _perm_assemble(src, base, p, T, K, D, g)

        o_heads = []
        for h in range(nH):
            q = perm_head(qg, lambda i, h=h: i * C + h * D)
            k = perm_head(kvg, lambda i, h=h: i * 2 * C + h * D)
            v = perm_head(kvg, lambda i, h=h: i * 2 * C + C + h * D)
            bias_h = bias_ref[h]  # (64, 64) fp32, PRE-PERMUTED host-side
            if g > 1:
                bias_h = jnp.concatenate([bias_h] * g, axis=-1)
                bias_h = jnp.concatenate([bias_h] * g, axis=-2)
            logits = jax.lax.dot_general(
                q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32, precision=prec)
            logits = logits + bias_h[None]
            if smask is not None:
                logits = logits + smask
            if out_dtype == jnp.bfloat16:
                e = jnp.exp(jnp.minimum(logits, jnp.float32(80.0)))
                probs = (e / e.sum(-1, keepdims=True)).astype(tok.dtype)
            else:
                probs = jax.nn.softmax(logits, axis=-1).astype(tok.dtype)
            o_heads.append(jax.lax.dot_general(
                probs, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32, precision=prec,
            ).astype(tok.dtype).reshape(T, 64, D))

        # repack perm -> packed lanes: slot i block (rows i*K..) of head h
        # lands at lanes i*C + h*D
        slot_blocks = []
        for i in range(p):
            hb = [oh[:, i * K:(i + 1) * K, :] for oh in o_heads]
            slot_blocks.append(hb[0] if nH == 1
                               else jnp.concatenate(hb, axis=-1))
        o_packed = (slot_blocks[0] if p == 1
                    else jnp.concatenate(slot_blocks, axis=-1))

        out = jax.lax.dot_general(
            o_packed.reshape(T * K, CP), wo_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec)
        return out + bo_ref[0].astype(f32)

    def kernel(*refs):
        if s:
            (xm_ref, xa_ref, xb_ref, mod_ref, ln_s_ref, ln_b_ref,
             wq_ref, bq_ref, wkv_ref, bkv_ref,
             wo_ref, bo_ref, bias_ref, o_ref) = refs
        else:
            (xm_ref, mod_ref, ln_s_ref, ln_b_ref,
             wq_ref, bq_ref, wkv_ref, bkv_ref,
             wo_ref, bo_ref, bias_ref, o_ref) = refs
        t = pl.program_id(1)
        xm = xm_ref[0]  # (R, Wp, 128)
        if s:
            slab = jnp.concatenate([xa_ref[0], xm, xb_ref[0]], axis=0)
            slab = jnp.roll(slab, -sp, axis=1)  # W shift in packed cols
        else:
            slab = xm
        rows_n = slab.shape[0]
        prec = (jax.lax.Precision.HIGHEST
                if xm.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
        slab = ln_apply(slab.reshape(rows_n * Wp, CP), ln_s_ref[0],
                        ln_b_ref[0], prec).reshape(rows_n, Wp, CP)

        tok = jnp.concatenate(
            [winchain_p(slab[8 * k + s:8 * k + s + 8]) for k in range(nK)],
            axis=0).reshape(T * K, CP)

        out = attn_core(t, tok, mod_ref, wq_ref, bq_ref, wkv_ref,
                        bkv_ref, wo_ref, bo_ref, bias_ref)
        out = out.astype(xm.dtype).reshape(T, K, CP)

        rows_k = [winchain_p_inv(out[k * W8:(k + 1) * W8])
                  for k in range(nK)]
        if s:
            body = [rows_k[0][8 - s:]] + rows_k[1:kR] + [rows_k[kR][:8 - s]]
            res = jnp.concatenate(body, axis=0)
            res = jnp.roll(res, sp, axis=1)
        else:
            res = jnp.concatenate(rows_k, axis=0) if nK > 1 else rows_k[0]
        if residual:
            res = xm + res
        o_ref[0] = res

    return kernel


def _pick_rows(H, W, C, itemsize, budget=None):
    """Rows per tile: slab + token/qkv/logit temps under budget.

    The default is deliberately large (v5e VMEM is far bigger than the
    conservative Mosaic default): small row-tiles make the SW-MSA halo
    window-row recompute a 25-50% overhead; at R=64 it is 12.5%
    (measured: dec2 s4 1.23 -> 1.01 ms with the larger budget)."""
    if budget is None:
        budget = 20 * 2**20
    W8 = W // 8
    # per window-row: slab rows (8, W, C) + tok/q/k/v (W8*64, C|128) +
    # fp32 logits/probs/mask (~3x (W8*32, 128))
    per_k = (8 * W * C * (2 * itemsize + 4)
             + W8 * 64 * (C * 4 + max(C, 128) * 3 * itemsize)
             + 3 * W8 * 64 * 64 * 4)
    r = max((budget // per_k) * 8, 8)
    r = min(r, H, 64)
    while H % r:
        r -= 8
    return max(r, 8)


def attention_image_reference(x, mod, ln_s, ln_b, wq, bq, wkv, bkv, wo, bo,
                              bias, *, win, shift, scale, num_heads,
                              has_ln=True, residual=True):
    """jnp reference: LN -> shift -> partition -> attention block ->
    reverse -> unshift -> (+x). Used by tests and the custom-vjp backward."""
    from uformer_tpu.ops.pallas.attention_block import (
        attention_block_reference,
    )
    from uformer_tpu.ops.window import (
        cyclic_shift,
        cyclic_unshift,
        window_partition,
        window_reverse,
    )

    B, H, W, C = x.shape
    y = x
    if has_ln:
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)
             * ln_s.astype(jnp.float32)
             + ln_b.astype(jnp.float32)).astype(x.dtype)
    y = cyclic_shift(y, shift)
    wnd = window_partition(y, win)
    if mod is None:
        mod = jnp.zeros((win * win, C), x.dtype)
    out = attention_block_reference(
        wnd, mod, None, None, wq, bq, wkv, bkv, wo, bo, bias,
        win=win, shift=shift, H=H, W=W, scale=scale, num_heads=num_heads,
        has_ln=False)
    out = cyclic_unshift(window_reverse(out, win, H, W), shift)
    return (x + out.astype(x.dtype)) if residual else out.astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _ad_factory(win, shift, scale, num_heads, has_ln, residual, interpret):
    kw = dict(win=win, shift=shift, scale=scale, num_heads=num_heads)

    @jax.custom_vjp
    def f(x, mod, ln_s, ln_b, wq, bq, wkv, bkv, wo, bo, bias):
        return fused_attention_image(x, mod, ln_s, ln_b, wq, bq, wkv, bkv,
                                     wo, bo, bias, has_ln=has_ln,
                                     residual=residual, interpret=interpret,
                                     **kw)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        x, mod, ln_s, ln_b, wq, bq, wkv, bkv, wo, bo, bias = res
        if jax.default_backend() == "tpu" and not interpret:
            # Hybrid backward: re-window x and g with XLA glue (the same
            # transposes the unfused forward pays), then one fused
            # windowed Pallas bwd kernel (attention_block.py) — the image
            # kernel itself needs no backward. This is what lets the
            # glue-free image forward run under training. Narrow-C
            # stages (C in {32, 64}) re-window on the full-lane packed
            # view and take the packed bwd kernel (folded-LN capable).
            from uformer_tpu.ops.pallas.attention_block import (
                fused_attention_block_bwd,
            )
            from uformer_tpu.ops import window as wops

            B, H, W, C = x.shape
            p = 128 // C if (C < 128 and 128 % C == 0 and C >= 32) else 1
            packed = (p > 1 and shift % p == 0 and W % p == 0)
            if packed:
                part = lambda v: wops.window_partition_packed(  # noqa: E731
                    wops.cyclic_shift_packed(v, shift, p), win, p)
                unpart = lambda v: wops.cyclic_unshift_packed(  # noqa: E731
                    wops.window_reverse_packed(v, win, H, W, p), shift, p)
            else:
                part = lambda v: wops.window_partition(  # noqa: E731
                    wops.cyclic_shift(v, shift), win)
                unpart = lambda v: wops.cyclic_unshift(  # noqa: E731
                    wops.window_reverse(v, win, H, W), shift)
            xw = part(x)
            gw = part(g)
            (dxw, dmod, dls, dlb, dwq, dbq, dwkv, dbkv, dwo, dbo,
             dbias) = fused_attention_block_bwd(
                xw, gw.astype(xw.dtype), mod, ln_s, ln_b, wq, bq, wkv,
                bkv, wo, bo, bias, win=win, shift=shift, H=H, W=W,
                scale=scale, num_heads=num_heads, has_ln=has_ln,
                has_mod=True, packed=packed)
            dx = unpart(dxw)
            if residual:
                dx = dx + g.astype(dx.dtype)
            cast = lambda d, v: d.astype(v.dtype)  # noqa: E731
            return (cast(dx, x), cast(dmod, mod), cast(dls, ln_s),
                    cast(dlb, ln_b), cast(dwq, wq), cast(dbq, bq),
                    cast(dwkv, wkv), cast(dbkv, bkv), cast(dwo, wo),
                    cast(dbo, bo), cast(dbias, bias))
        _, vjp = jax.vjp(
            lambda *a: attention_image_reference(
                *a, has_ln=has_ln, residual=residual, **kw),
            *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_attention_image_ad(x, mod, ln_s, ln_b, wq, bq, wkv, bkv, wo, bo,
                             bias, *, win, shift, scale, num_heads,
                             has_ln=True, residual=True, interpret=False):
    """Differentiable wrapper: Pallas image-layout forward; backward =
    windowed Pallas bwd kernel behind XLA re-windowing glue on TPU
    (reference-jnp VJP elsewhere)."""
    f = _ad_factory(win, shift, float(scale), num_heads, has_ln, residual,
                    interpret)
    if mod is None:
        mod = jnp.zeros((win * win, x.shape[-1]), x.dtype)
    if ln_s is None:
        ln_s = jnp.ones((x.shape[-1],), jnp.float32)
        ln_b = jnp.zeros((x.shape[-1],), jnp.float32)
    return f(x, mod, ln_s, ln_b, wq, bq, wkv, bkv, wo, bo, bias)


def _fused_attention_image_packed(x, mod, ln_s, ln_b, wq, bq, wkv, bkv,
                                  wo, bo, bias, *, shift, scale, num_heads,
                                  has_ln, residual, interpret, vmem_mb):
    """Pixel-packed variant for C in {32, 64} (p = 128//C): the image is
    viewed as (B, H, W/p, 128) — a FREE minor-dims reshape — so every DMA
    and wide VPU/MXU pass runs on full 128 lanes. Projections use
    kron(I_p, w) block-diagonal weights; the rel-pos bias is pre-permuted
    to the packed core's token order (see _perm_indices)."""
    import numpy as np

    B, H, W, C = x.shape
    p = 128 // C
    nH = num_heads
    D = C // nH
    if shift and shift % p:
        raise ValueError(f"packed attention needs p | shift "
                         f"(p={p}, shift={shift})")
    if W % p:
        raise ValueError(f"W={W} must be a multiple of p={p}")
    CP = 128
    xp = x.reshape(B, H, W // p, CP)

    eye = jnp.eye(p, dtype=wq.dtype)
    wq_k = jnp.kron(eye, wq)                     # (128, 128)
    wkv_k = jnp.kron(eye, wkv)                   # (128, 256)
    wo_k = jnp.kron(eye, wo)                     # (128, 128)
    bq_t = jnp.tile(bq, p).reshape(1, CP)
    bkv_t = jnp.tile(bkv, p).reshape(1, 2 * CP)
    bo_t = jnp.tile(bo, p).reshape(1, CP)

    has_mod = mod is not None
    if mod is None:
        mod = jnp.zeros((64, C), x.dtype)
    if ln_s is None:
        ln_s = jnp.ones((C,), jnp.float32)
        ln_b = jnp.zeros((C,), jnp.float32)
    ln_s_t = jnp.tile(ln_s, p).reshape(1, CP)
    ln_b_t = jnp.tile(ln_b, p).reshape(1, CP)
    wp8 = 8 // p
    # mod rows are tokens t = r*8 + pc*p + i -> packed (r*wp8+pc, i*C+ch)
    mod_p = mod.reshape(8, wp8, p * C).reshape(64 // p, CP)

    pi = _perm_indices(p)
    bias_p = jnp.asarray(bias).astype(jnp.float32)[:, pi][:, :, pi]

    R = _pick_rows(H, W, C, x.dtype.itemsize,
                   budget=vmem_mb * 2**20 if vmem_mb else None)
    kR = R // 8
    nB8 = H // 8
    Wp = W // p
    W8 = W // 8
    nK = kR + (1 if shift else 0)
    T = nK * W8
    g = 2 if T % 2 == 0 else 1
    kernel = _make_packed_kernel(R, H, W, C, p, nH, D, g, float(scale),
                                 shift, has_mod, has_ln, residual, x.dtype)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    xm_spec = pl.BlockSpec((1, R, Wp, CP), lambda b, t: (b, t, 0, 0),
                           memory_space=pltpu.VMEM)
    halo_specs = [
        pl.BlockSpec((1, 8, Wp, CP),
                     lambda b, t: (b, jax.lax.rem(t * kR - 1 + nB8, nB8),
                                   0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, Wp, CP),
                     lambda b, t: (b, jax.lax.rem(t * kR + kR, nB8), 0, 0),
                     memory_space=pltpu.VMEM),
    ] if shift else []
    in_specs = [xm_spec] + halo_specs + [
        vmem, vmem, vmem,            # mod, ln_s, ln_b
        vmem, vmem, vmem, vmem,      # wq, bq, wkv, bkv
        vmem, vmem,                  # wo, bo
        vmem,                        # bias
    ]
    halo_args = (xp, xp) if shift else ()
    out = pl.pallas_call(
        kernel,
        grid=(B, H // R),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R, Wp, CP), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Wp, CP), x.dtype),
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=int(max(vmem_mb * 2.5, 50)) * 2**20)
            if not interpret else None),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * (4 * C * p + 2 * 64),
            bytes_accessed=2 * B * H * W * C * x.dtype.itemsize,
            transcendentals=B * H * W * nH,
        ),
    )(xp, *halo_args, mod_p, ln_s_t, ln_b_t, wq_k, bq_t, wkv_k, bkv_t,
      wo_k, bo_t, bias_p)
    return out.reshape(B, H, W, C)


@functools.partial(jax.jit, static_argnames=(
    "win", "shift", "scale", "num_heads", "has_ln", "residual", "interpret",
    "vmem_mb"))
def fused_attention_image(x, mod, ln_s, ln_b, wq, bq, wkv, bkv, wo, bo,
                          bias, *, win, shift, scale, num_heads,
                          has_ln=True, residual=True, interpret=False,
                          vmem_mb=0):
    """x: (B, H, W, C) raw block input; returns (B, H, W, C).

    residual=True returns x + Attn(LN(x)); False returns just the
    attention output (image layout, un-shifted). Requires win == 8,
    H % 8 == W % 8 == 0, and C % 128 == 0 on TPU (raises ValueError
    otherwise — narrow C wedges Mosaic's layout inference); interpret
    mode is the only exception.
    """
    B, H, W, C = x.shape
    if win != 8:
        raise ValueError(f"image-layout kernel supports win=8, got {win}")
    if H % 8 or W % 8:
        raise ValueError(f"H={H}, W={W} must be multiples of 8")
    if C % 128 == 0 or 128 % C != 0 or C < 32:
        if C % 128 and not interpret:
            # Lane-misaligned C wedges Mosaic's layout inference
            # (observed: >9 min pathological compiles); the model routes
            # such stages to the windowed kernel instead.
            raise ValueError(
                f"image-layout kernel requires C % 128 == 0 or "
                f"128 % C == 0 with C >= 32 on TPU, got C={C}")
    else:
        # narrow C with 128 % C == 0 (32, 64): pixel-packed variant
        return _fused_attention_image_packed(
            x, mod, ln_s, ln_b, wq, bq, wkv, bkv, wo, bo, bias,
            shift=shift, scale=scale, num_heads=num_heads, has_ln=has_ln,
            residual=residual, interpret=interpret, vmem_mb=vmem_mb)
    nH = num_heads
    D = C // nH
    hg = min(nH, max(1, 128 // D))
    while nH % hg:  # hg must divide nH (largest divisor <= 128//D)
        hg -= 1
    nG = nH // hg
    # projection weights stay in their raw (C, C) / (C, 2C) layout —
    # head groups are lane/sublane slices taken inside the kernel, so
    # no XLA transpose pass runs per forward. Bias vectors carry a
    # dummy sublane axis for the (8, 128) block rule.
    bq_h = bq.reshape(1, C)
    bkv_h = bkv.reshape(1, 2 * C)
    has_mod = mod is not None
    if mod is None:
        mod = jnp.zeros((64, C), x.dtype)
    if ln_s is None:
        ln_s = jnp.ones((C,), jnp.float32)
        ln_b = jnp.zeros((C,), jnp.float32)

    R = _pick_rows(H, W, C, x.dtype.itemsize,
                   budget=vmem_mb * 2**20 if vmem_mb else None)
    kR = R // 8
    nB8 = H // 8
    W8 = W // 8
    nK = kR + (1 if shift else 0)
    T = nK * W8
    g = 2 if T % 2 == 0 else 1
    kernel = _make_kernel(R, H, W, C, nH, D, hg, g, float(scale), shift,
                          has_mod, has_ln, residual, x.dtype)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    xm_spec = pl.BlockSpec((1, R, W, C), lambda b, t: (b, t, 0, 0),
                           memory_space=pltpu.VMEM)
    halo_specs = [
        pl.BlockSpec((1, 8, W, C),
                     lambda b, t: (b, jax.lax.rem(t * kR - 1 + nB8, nB8),
                                   0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, W, C),
                     lambda b, t: (b, jax.lax.rem(t * kR + kR, nB8), 0, 0),
                     memory_space=pltpu.VMEM),
    ] if shift else []
    in_specs = [xm_spec] + halo_specs + [
        vmem, vmem, vmem,            # mod, ln_s, ln_b
        vmem, vmem, vmem, vmem,      # wq, bq, wkv, bkv
        vmem, vmem,                  # wo, bo
        vmem,                        # bias
    ]
    halo_args = (x, x) if shift else ()
    return pl.pallas_call(
        kernel,
        grid=(B, H // R),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R, W, C), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=int(max(vmem_mb * 2.5, 50)) * 2**20)
            if not interpret else None),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * (4 * C + 2 * 64),
            bytes_accessed=2 * B * H * W * C * x.dtype.itemsize,
            transcendentals=B * H * W * nH,
        ),
    )(x, *halo_args, mod, ln_s, ln_b, wq, bq_h, wkv, bkv_h, wo, bo,
      bias.astype(jnp.float32))
