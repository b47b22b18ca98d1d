"""Whole-stage megakernel: EVERY LeWin block of a Uformer stage (attention
sub-block + LeFF sub-block, `depth` blocks) as ONE Pallas kernel.

Covers reference `BasicUformerLayer.forward` (`/root/reference/model.py:
1054-1060`: the for-blk loop over LeWinTransformerBlock) for the
deterministic path on small-resolution stages.

Why: at 16²-64² resolutions (enc2/enc3/bottleneck/dec0/dec1 — 28 of
Uformer_B's 40 blocks) each block's compute is tens of microseconds, so
per-kernel launch overhead, per-kernel weight DMA ramp, and the serial
MXU->VPU phase structure dominate — the round-2 per-kernel design ran
these stages at 3-10x their MXU floor. Here the whole image lives in a
VMEM scratch across the entire stage:

  * grid = (depth, B), block index OUTER: each block's weights are
    DMA'd once and stay VMEM-resident for all B images; activations
    never touch HBM between blocks (input read once, output written
    once per image).
  * The alternating SW-MSA shift (reference model.py:1026-1037) is
    handled with a TRACED shift scalar: the image is rolled by the
    constant win/2 and selected against the unrolled copy, and the
    shift-region mask is index arithmetic (`_region_ids`) that
    degenerates to the plain window-pairing mask when shift == 0 —
    one kernel body serves both parities.
  * Whole-image layout: window partition/reverse are free sublane/outer
    reshapes (C % 128 == 0 keeps the lane dim untouched); the LeFF
    conv ring is an in-VMEM zero pad; no halo recompute anywhere.

Weights arrive stacked along a leading `depth` axis (the flax param
trees of the per-block modules are identical to the unfused path, so
checkpoints are unaffected; stacking is one cheap XLA concat per stage).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uformer_tpu.ops.pallas.attention_block import _region_ids
from uformer_tpu.ops.pallas.leff import _gelu

# Diagonal-block softmax for the g == 2 window pairing: the paired
# (P=128, P=128) logits volume is half masked-off cross-window terms by
# construction; packing the two valid 64x64 diagonal blocks into a
# (64, 128) full-lane-width layout halves the softmax exp/mask-add/div
# volume and the bias+mask scratch. Read once at import (same contract
# as leff._DWCONV_BF16); fused_stage's diag_softmax arg overrides.
_DIAG_SM = os.environ.get("UFORMER_TPU_DIAG_SOFTMAX", "0") == "1"


@functools.lru_cache(maxsize=None)
def _make_stage_kernel(n, B, H, W, C, Ch, nH, D, hg, g, scale, use_shift,
                       has_mod, out_dtype, parts="both", dw_bf16=False,
                       ileave=1, diag=False, nck=1, nls=1):
    """One kernel per stage geometry. win == 8, C % 128 == 0 (on TPU).

    `ileave`: images processed per grid step. The per-image phase chain
    is strictly serial (LN -> proj -> bmm -> softmax -> ... -> gelu),
    so MXU sits idle through every VPU phase and vice versa; with two
    INDEPENDENT images in flight the VLIW scheduler overlaps one
    image's matmuls with the other's vector phases. Measured (v5e,
    bs8@256² stage geometries): enc2 4.27 -> 3.98 ms, dec1 7.36 ->
    7.13 ms (enc3 at 32² regressed 1.75 -> 1.98, so the auto rule
    keeps T >= 64 only).

    `nck`/`nls`: static inner-loop chunking for the T > 64 stages —
    attention runs `nck` window-pair chunks and LeFF `nls` row-strips,
    capping the traced whole-image temporaries (the (T//g, P, P) logits
    volume and the (H*W, Ch) f32 hidden) that spilled Mosaic's register
    budget at T = 256. nck == nls == 1 reproduces the validated T <= 64
    op sequence exactly."""
    W8 = W // 8
    H8 = H // 8
    T = H8 * W8          # windows per image
    P = g * 64
    nG = nH // hg
    s = 4                # win // 2; applied iff the traced parity says so
    f32 = jnp.float32
    cheap = out_dtype == jnp.bfloat16

    def winchain(rows8):
        y = rows8.reshape(8, W8, 8, C).transpose(1, 0, 2, 3)
        return y.reshape(W8, 64, C)

    def winchain_inv(wins):
        y = wins.reshape(W8, 8, 8, C).transpose(1, 0, 2, 3)
        return y.reshape(8, W, C)

    def ln(img, s_ref, b_ref):
        # one pass over the data: var = E[x^2] - mu^2 (jnp.var would
        # re-read x to form (x - mu)^2)
        xf = img.astype(f32)
        mu = xf.mean(-1, keepdims=True)
        m2 = (xf * xf).mean(-1, keepdims=True)
        var = m2 - mu * mu
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5)
                * s_ref[0].astype(f32)
                + b_ref[0].astype(f32)).astype(img.dtype)

    def kernel(x_ref, ln1_s_ref, ln1_b_ref, wq_ref, bq_ref, wk_ref, bk_ref,
               wv_ref, bv_ref, wo_ref, bo_ref, bias_ref, mod_ref,
               ln2_s_ref, ln2_b_ref, w1_ref, b1_ref, wd_ref, bd_ref,
               w2_ref, b2_ref, o_ref, xs_ref, hid_ref, smask_ref):
        j = pl.program_id(0)
        b = pl.program_id(1)

        @pl.when(j == 0)
        def _load():
            for u in range(ileave):
                xs_ref[ileave * b + u] = x_ref[u]

        prec = (jax.lax.Precision.HIGHEST
                if out_dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
        if use_shift:
            shifted = (j % 2) == 1
        else:
            shifted = jnp.bool_(False)

        # the additive logits term (rel-pos bias + shift-region mask)
        # depends on j only — via the parity and the block's bias table —
        # not on the image: build the per-head combined term once per
        # block (first image) into a scratch, saving the concat + two
        # adds over the (T//g, P, P) logits volume for the other B-1
        # images
        if parts in ("both", "attn"):
            @pl.when(b == 0)
            def _mask():
                sh = jnp.where(shifted, s, 0)
                rows = jax.lax.broadcasted_iota(jnp.int32, (T // g, P), 0)
                cols = jax.lax.broadcasted_iota(jnp.int32, (T // g, P), 1)
                wloc = rows * g + cols // 64
                n_off = cols % 64
                k_idx = wloc // W8
                j_idx = wloc - k_idx * W8
                rh = _region_ids(8, sh, H, k_idx, n_off // 8)
                rw = _region_ids(8, sh, W, j_idx, n_off % 8)
                rid = wloc * 9 + rh * 3 + rw
                neq = (rid[:, :, None] != rid[:, None, :]).astype(f32)
                smask = neq * jnp.float32(-100.0)
                if diag:
                    # pack the two valid 64x64 diagonal blocks into
                    # (64, P) full lane width: rows 0-63 of the left
                    # half-P and rows 64-127 of the right half — the
                    # right block's columns already sit in lanes 64-127,
                    # so this is one select, no lane movement
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (T // g, 64, P), 2)
                    smask = jnp.where(lane < 64, smask[:, 0:64, :],
                                      smask[:, 64:P, :])
                for h in range(nH):
                    bias_h = bias_ref[0, h]
                    if diag:
                        bias_h = jnp.concatenate([bias_h] * g, axis=-1)
                    elif g > 1:
                        bias_h = jnp.concatenate([bias_h] * g, axis=-1)
                        bias_h = jnp.concatenate([bias_h] * g, axis=-2)
                    smask_ref[h] = (bias_h[None] + smask) \
                        .astype(smask_ref.dtype)

        # ---------- the `ileave` images' chains are independent: trace
        # them phase-interleaved so the scheduler overlaps MXU and VPU
        xcurs = [xs_ref[ileave * b + u] for u in range(ileave)]
        if parts in ("both", "attn"):
            xcurs = [attn_part(xc, shifted, prec, ln1_s_ref, ln1_b_ref,
                               wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                               bv_ref, wo_ref, bo_ref, bias_ref, mod_ref,
                               smask_ref) for xc in xcurs]
        if parts in ("both", "leff"):
            xcurs = [leff_part(xc, prec, cheap, ln2_s_ref, ln2_b_ref,
                               w1_ref, b1_ref, wd_ref, bd_ref, w2_ref,
                               b2_ref, hid_ref, u)
                     for u, xc in enumerate(xcurs)]

        for u in range(ileave):
            xs_ref[ileave * b + u] = xcurs[u]

        @pl.when(j == n - 1)
        def _store():
            for u in range(ileave):
                o_ref[u] = xcurs[u]

    def attn_part(xcur, shifted, prec, ln1_s_ref, ln1_b_ref, wq_ref,
                  bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                  bias_ref, mod_ref, smask_ref):
        xa = ln(xcur, ln1_s_ref, ln1_b_ref)
        if use_shift:
            # branch on the parity: the unshifted blocks skip the two
            # roll passes entirely (the old roll-both-then-select paid
            # three passes on every block)
            xa = jax.lax.cond(
                shifted,
                lambda v: jnp.roll(jnp.roll(v, -s, axis=0), -s, axis=1),
                lambda v: v, xa)
        tok = jnp.concatenate(
            [winchain(xa[8 * k:8 * k + 8]) for k in range(H8)],
            axis=0).reshape(T * 64, C)
        if has_mod:
            tok = (tok.reshape(T, 64, C)
                   + mod_ref[0][None].astype(tok.dtype)).reshape(T * 64, C)

        # Tc window-pairs per chunk (nck == 1: whole image at once, the
        # validated T <= 64 sequence). Chunks are static row slices of
        # `tok`, so each chunk's q/k/v/logits temporaries die before the
        # next chunk traces — this is what keeps T = 256 inside Mosaic's
        # register budget.
        Tc = (T // g) // nck
        out_chunks = []
        for ci in range(nck):
            csl = slice(ci * Tc * P, (ci + 1) * Tc * P)
            tok_c = tok[csl]
            out_c = jnp.zeros((Tc * P, C), f32)
            for gi in range(nG):
                # head-group weights are lane/sublane slices of the raw
                # (C, C) projection matrices — no host-side transpose pass
                gsl = slice(gi * hg * D, (gi + 1) * hg * D)

                def proj(w_ref, b_ref, gsl=gsl, tok_c=tok_c):
                    y = jax.lax.dot_general(
                        tok_c, w_ref[0][:, gsl],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=f32, precision=prec)
                    return (y + b_ref[0, 0, gsl].astype(f32)) \
                        .astype(tok_c.dtype)

                # fold the softmax scale into q right after the projection
                # (one cheap pass over (Tc*P, hg*D)) so the (Tc, P, P)
                # logits tensor skips a full scalar-multiply pass
                qg = (proj(wq_ref, bq_ref).astype(f32)
                      * jnp.float32(scale)).astype(tok_c.dtype)
                kg = proj(wk_ref, bk_ref)
                vg = proj(wv_ref, bv_ref)
                o_parts = []
                for hh in range(hg):
                    h = gi * hg + hh
                    sl = slice(hh * D, (hh + 1) * D)
                    q = qg[:, sl].reshape(Tc, P, D)
                    k = kg[:, sl].reshape(Tc, P, D)
                    v = vg[:, sl].reshape(Tc, P, D)
                    smask_c = smask_ref[h, ci * Tc:(ci + 1) * Tc]
                    if diag:
                        # compute ONLY the two valid diagonal 64x64
                        # blocks, laid out at full lane width — halves
                        # the QK MXU flops as well as the softmax
                        # exp/add/div volume (the packed row i holds
                        # window A's row i in lanes 0-63 and window B's
                        # in lanes 64-127, matching the smask layout)
                        bn = (((2,), (2,)), ((0,), (0,)))
                        ld = jnp.concatenate([
                            jax.lax.dot_general(
                                q[:, 0:64], k[:, 0:64],
                                dimension_numbers=bn,
                                preferred_element_type=f32,
                                precision=prec),
                            jax.lax.dot_general(
                                q[:, 64:P], k[:, 64:P],
                                dimension_numbers=bn,
                                preferred_element_type=f32,
                                precision=prec),
                        ], axis=-1) + smask_c.astype(f32)
                        lane = jax.lax.broadcasted_iota(
                            jnp.int32, (Tc, 64, P), 2)
                        inA = lane < 64
                        if cheap:
                            e = jnp.exp(jnp.minimum(ld, jnp.float32(80.0)))
                        else:
                            eA0 = jnp.where(inA, ld, jnp.float32(-1e30))
                            mA = eA0.max(-1, keepdims=True)
                            mB = jnp.where(inA, jnp.float32(-1e30), ld) \
                                .max(-1, keepdims=True)
                            e = jnp.exp(ld - jnp.where(inA, mA, mB))
                        eA = jnp.where(inA, e, jnp.float32(0.0))
                        sA = eA.sum(-1, keepdims=True)
                        sB = (e - eA).sum(-1, keepdims=True)
                        probs = (e / jnp.where(inA, sA, sB)) \
                            .astype(tok_c.dtype)
                        o_parts.append(jnp.concatenate([
                            jax.lax.dot_general(
                                probs[:, :, 0:64], v[:, 0:64, :],
                                dimension_numbers=(((2,), (1,)),
                                                   ((0,), (0,))),
                                preferred_element_type=f32, precision=prec),
                            jax.lax.dot_general(
                                probs[:, :, 64:P], v[:, 64:P, :],
                                dimension_numbers=(((2,), (1,)),
                                                   ((0,), (0,))),
                                preferred_element_type=f32, precision=prec),
                        ], axis=1).astype(tok_c.dtype))
                        continue
                    logits = jax.lax.dot_general(
                        q, k,
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=f32, precision=prec)
                    logits = logits + smask_c.astype(f32)
                    if cheap:
                        # bf16 path: skip the max-subtraction reduce —
                        # post-LN logits are bounded far below exp's f32
                        # overflow (clamped at 80; masked lanes are -100)
                        e = jnp.exp(jnp.minimum(logits, jnp.float32(80.0)))
                        probs = (e / e.sum(-1, keepdims=True)) \
                            .astype(tok_c.dtype)
                    else:
                        probs = jax.nn.softmax(logits, axis=-1) \
                            .astype(tok_c.dtype)
                    o_parts.append(jax.lax.dot_general(
                        probs, v,
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=f32, precision=prec,
                    ).astype(tok_c.dtype))
                og = (o_parts[0] if hg == 1
                      else jnp.concatenate(o_parts, axis=-1))
                out_c = out_c + jax.lax.dot_general(
                    og.reshape(Tc * P, hg * D), wo_ref[0][gsl, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32, precision=prec)
            out_chunks.append(out_c)
        out = out_chunks[0] if nck == 1 else jnp.concatenate(out_chunks)
        out = (out + bo_ref[0].astype(f32)).astype(xcur.dtype)
        out = out.reshape(T, 64, C)
        img = jnp.concatenate(
            [winchain_inv(out[k * W8:(k + 1) * W8]) for k in range(H8)],
            axis=0)
        if use_shift:
            img = jax.lax.cond(
                shifted,
                lambda v: jnp.roll(jnp.roll(v, s, axis=0), s, axis=1),
                lambda v: v, img)
        return xcur + img

    # ---------- LeFF sub-block: x += L2(g(DW(g(L1(LN2(x)))))) ----------
    def leff_part(xcur, prec, cheap, ln2_s_ref, ln2_b_ref, w1_ref, b1_ref,
                  wd_ref, bd_ref, w2_ref, b2_ref, hid_ref, u=0):
        # each interleaved image gets its own (H+2)-row slab of the
        # hidden scratch — sharing one slab would serialize the chains
        # through a write-after-read hazard
        r0 = u * (H + 2)
        S = H // nls  # rows per strip; nls == 1 is the validated path
        tok2 = ln(xcur, ln2_s_ref, ln2_b_ref).reshape(H * W, C)
        zrow = jnp.zeros((1, W + 2, Ch), xcur.dtype)
        hid_ref[r0:r0 + 1] = zrow
        hid_ref[r0 + H + 1:r0 + H + 2] = zrow
        zcol = jnp.zeros((S, 1, Ch), xcur.dtype)
        # phase 1: hidden projection + gelu, strip-wise into the padded
        # VMEM slab (caps the (H*W, Ch) f32 temporary at S*W rows)
        for si in range(nls):
            hcore = jax.lax.dot_general(
                tok2[si * S * W:(si + 1) * S * W], w1_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec)
            hcore = _gelu(hcore + b1_ref[0].astype(f32), cheap=cheap) \
                .astype(xcur.dtype).reshape(S, W, Ch)
            hid_ref[r0 + 1 + si * S:r0 + 1 + (si + 1) * S] = \
                jnp.concatenate([zcol, hcore, zcol], axis=1)
        # dw_bf16: accumulate the 9 taps in the activation dtype (one
        # mul+add per tap instead of convert+mul+add in f32) — a VPU-pass
        # knob for the bf16 serving path; worst-case 9-tap bf16
        # accumulation error ~2^-8 relative, below the bf16 activations'
        # own quantization noise downstream
        acc_dt = xcur.dtype if (dw_bf16 and cheap) else f32
        # phase 2: 9-tap depthwise + gelu + output projection, strip-wise
        # (the slab is fully written, so each strip's 1-row halo reads are
        # plain offset loads)
        out_strips = []
        for si in range(nls):
            acc = jnp.zeros((S, W, Ch), acc_dt)
            for dy in range(3):
                rows3 = hid_ref[r0 + si * S + dy:r0 + si * S + dy + S]
                for dx in range(3):
                    acc += rows3[:, dx:dx + W].astype(acc_dt) * \
                        wd_ref[0, dy, dx, :].astype(acc_dt)
            acc = _gelu(acc.astype(f32) + bd_ref[0].astype(f32),
                        cheap=cheap)
            out2 = jax.lax.dot_general(
                acc.astype(xcur.dtype).reshape(S * W, Ch), w2_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec)
            out_strips.append((out2 + b2_ref[0].astype(f32))
                              .astype(xcur.dtype))
        out2 = out_strips[0] if nls == 1 else jnp.concatenate(out_strips)
        return xcur + out2.reshape(H, W, C)

    return kernel


def stage_reference(x, p, *, scale, num_heads, use_shift, has_mod):
    """jnp reference: the per-block composition of the existing reference
    functions (tests + the custom-vjp backward of the eval-only path)."""
    from uformer_tpu.ops.pallas.attention_image import (
        attention_image_reference,
    )
    from uformer_tpu.ops.pallas.leff import leff_reference

    n = p["wq"].shape[0]
    win = 8
    for j in range(n):
        shift = 4 if (use_shift and j % 2 == 1) else 0
        wkv = jnp.concatenate([p["wk"][j], p["wv"][j]], axis=1)
        bkv = jnp.concatenate([p["bk"][j], p["bv"][j]])
        x = attention_image_reference(
            x, p["mod"][j] if has_mod else None, p["ln1_s"][j],
            p["ln1_b"][j], p["wq"][j], p["bq"][j], wkv, bkv, p["wo"][j],
            p["bo"][j], p["bias"][j], win=win, shift=shift, scale=scale,
            num_heads=num_heads, has_ln=True, residual=True)
        x = leff_reference(
            x, p["w1"][j], p["b1"][j], p["wd"][j], p["bd"][j], p["w2"][j],
            p["b2"][j], ln_s=p["ln2_s"][j], ln_b=p["ln2_b"][j],
            residual=True)
    return x


@functools.partial(jax.jit, static_argnames=(
    "scale", "num_heads", "use_shift", "has_mod", "interpret", "vmem_mb",
    "parts", "dw_bf16", "ileave", "gpar", "diag_softmax", "nck", "nls"))
def fused_stage(x, p, *, scale, num_heads, use_shift, has_mod,
                interpret=False, vmem_mb=0, parts="both", dw_bf16=None,
                ileave=0, gpar=0, diag_softmax=None, nck=0, nls=0):
    """x: (B, H, W, C); p: dict of per-block-stacked weights:
    ln1_s/ln1_b (n, C), wq (n, C, C), bq (n, C), wk/wv (n, C, C),
    bk/bv (n, C), wo (n, C, C), bo (n, C), bias (n, nH, 64, 64) fp32,
    mod (n, 64, C), ln2_s/ln2_b (n, C), w1 (n, C, Ch), b1 (n, Ch),
    wd (n, 3, 3, Ch), bd (n, Ch), w2 (n, Ch, C), b2 (n, C).

    Requires win == 8, H % 8 == W % 8 == 0 and (on TPU) C % 128 == 0."""
    B, H, W, C = x.shape
    n = p["wq"].shape[0]
    Ch = p["w1"].shape[2]
    nH = num_heads
    D = C // nH
    if H % 8 or W % 8:
        raise ValueError(f"H={H}, W={W} must be multiples of 8")
    if C % 128 and not interpret:
        raise ValueError(f"stage kernel requires C % 128 == 0, got {C}")
    if dw_bf16 is None:  # policy: f32 taps unless explicitly opted in
        from uformer_tpu.ops.pallas.leff import _tap_dtype
        dw_bf16 = _tap_dtype(x.dtype) != jnp.float32
    hg = min(nH, max(1, 128 // D))
    while nH % hg:
        hg -= 1
    nG = nH // hg
    T = (H // 8) * (W // 8)
    g = gpar or (2 if T % 2 == 0 else 1)
    if not ileave:
        # 2-image interleave on the 64² stages only (T == 64, C <= 256):
        # A/B on v5e bs8 measured enc2 4.27 -> 3.98, dec1 7.36 -> 7.13,
        # but enc3 (32²) 1.75 -> 1.98 and C=512 risks temporary spill —
        # the smaller stages keep one image per grid step; T > 64 keeps
        # ileave=1 (its hidden slab alone is ~17 MB at dec2)
        ileave = 2 if (B % 2 == 0 and C <= 256 and T == 64) else 1
    elif B % ileave:
        # grid=(n, B // ileave) would silently skip the trailing
        # B % ileave images — fall back to one image per grid step
        ileave = 1

    # per-block vectors carry a dummy sublane axis: a (1, X) block of an
    # (n, X) array violates the TPU (8, 128)-divisible block rule.
    # Projection matrices stay in their raw (n, C, C) layout — head
    # groups are lane/sublane slices taken inside the kernel, so no
    # XLA transpose pass runs per forward.
    vec = lambda v: v.reshape(n, 1, v.shape[-1])  # noqa: E731
    args = (x,
            vec(p["ln1_s"]), vec(p["ln1_b"]),
            p["wq"], vec(p["bq"]), p["wk"], vec(p["bk"]),
            p["wv"], vec(p["bv"]),
            p["wo"], vec(p["bo"]),
            p["bias"].astype(jnp.float32), p["mod"],
            vec(p["ln2_s"]), vec(p["ln2_b"]),
            p["w1"], vec(p["b1"]), p["wd"], vec(p["bd"]), p["w2"],
            vec(p["b2"]))

    if diag_softmax is None:
        diag_softmax = _DIAG_SM
    diag = bool(diag_softmax) and g == 2

    # T > 64 (the 128²+ stages): chunk the attention over <=32 window
    # pairs and LeFF over row strips whose f32 hidden stays <=8 MB, so no
    # traced temporary exceeds what the validated 64² stages allocate.
    # T <= 64 keeps nck == nls == 1 — the hardware-validated sequence.
    # Explicit nck/nls override the auto rule (must divide T//g / H).
    Tg = T // g
    if not nck:
        nck = 1
        if T > 64:
            while Tg // nck > 32 and Tg % (nck * 2) == 0:
                nck *= 2
    if not nls:
        nls = 1
        if T > 64:
            while H // nls > 8 and (H // nls) * W * Ch * 4 > 8 * 2**20 \
                    and H % (nls * 2) == 0:
                nls *= 2
    if Tg % nck or H % nls:
        raise ValueError(f"nck={nck} must divide T//g={Tg} and "
                         f"nls={nls} must divide H={H}")

    kernel = _make_stage_kernel(n, B, H, W, C, Ch, nH, D, hg, g,
                                float(scale), use_shift, has_mod, x.dtype,
                                parts, dw_bf16, ileave, diag, nck, nls)

    def wspec(a):
        shape = (1,) + a.shape[1:]
        nz = (0,) * (a.ndim - 1)
        return pl.BlockSpec(shape, lambda j, b: (j,) + nz,
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((ileave, H, W, C), lambda j, b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [wspec(a) for a in args[1:]]
    return pl.pallas_call(
        kernel,
        grid=(n, B // ileave),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ileave, H, W, C),
                               lambda j, b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, H, W, C), x.dtype),
            pltpu.VMEM((ileave * (H + 2), W + 2, Ch), x.dtype),
            # combined bias+mask: bf16 on the bf16 path (logits already
            # carry 2^-8 input noise; halves the largest scratch at 128²);
            # diag packing halves the window-pair axis again
            pltpu.VMEM((nH, T // g, 64 if diag else g * 64, g * 64),
                       x.dtype if x.dtype == jnp.bfloat16
                       else jnp.float32),
        ],
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=(vmem_mb or 100) * 2**20)
            if not interpret else None),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * B * H * W * C * (4 * C + 2 * 64 + 8 * C)
            + 2 * n * B * H * W * Ch * 9,
            bytes_accessed=2 * B * H * W * C * x.dtype.itemsize
            + 12 * n * C * C * x.dtype.itemsize,
            transcendentals=n * B * H * W * (nH + 2 * Ch // C),
        ),
    )(*args)


@functools.lru_cache(maxsize=None)
def _stage_ad_factory(scale, num_heads, use_shift, has_mod, interpret):
    kw = dict(scale=scale, num_heads=num_heads, use_shift=use_shift,
              has_mod=has_mod)

    @jax.custom_vjp
    def f(x, p):
        return fused_stage(x, p, interpret=interpret, **kw)

    def fwd(x, p):
        return f(x, p), (x, p)

    def bwd(res, g):
        x, p = res
        _, vjp = jax.vjp(lambda x, p: stage_reference(x, p, **kw), x, p)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_stage_ad(x, p, *, scale, num_heads, use_shift, has_mod,
                   interpret=False):
    """Differentiable wrapper (eval path: Pallas forward, jnp VJP)."""
    return _stage_ad_factory(float(scale), num_heads, use_shift, has_mod,
                             interpret)(x, p)
