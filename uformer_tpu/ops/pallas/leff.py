"""Fused LeFF Pallas TPU kernel: Linear -> GELU -> 3x3 depthwise conv ->
GELU -> Linear in one VMEM-resident pipeline.

The LeFF hidden tensor is mlp_ratio(=4)x wider than the activations; on
the XLA path it round-trips HBM four times per block (write after
linear1, read/write around the dwconv, read for linear2) — the single
largest traffic term of a Uformer forward. Here the hidden tile lives in
VMEM: per grid step the kernel takes an H-tile of the input with a
1-row/col halo, runs both matmuls on the MXU and the 9-tap depthwise conv
on the VPU, and writes only the final C-wide output.

Halo handling: the +-1-row conv halo is read through two extra
BlockSpec views of the same input (the 8-row block just above and just
below the tile) — no HBM gather, no manual DMA (which would require
128-aligned minor dims that C=32/64 stages violate). The W halo is a
zero-pad ring built in VMEM. Optionally folds the preceding LayerNorm
(ln_s/ln_b) and the block residual (out += x) so an entire
`x + LeFF(LN(x))` sub-block is ONE read and ONE write of x.

This kernel is also the TPU-native answer to the reference's one custom
CUDA kernel (torch_dwconv.DepthwiseConv2d used by FastLeFF,
/root/reference/model.py:14-58): `fastleff` routes here.

Layout: x (B, H, W, C) NHWC; weights w1 (C, Ch), wd (3, 3, Ch),
w2 (Ch, C); GELU is the erf form (matching torch nn.GELU) via a
rational-polynomial erf (Mosaic lowers neither erf nor erfc).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Resolved ONCE at import: this knob feeds trace-time kernel construction
# inside jit-ed functions and is not part of any jit cache key — reading
# it per-trace would silently return stale kernels after an env flip.
_DWCONV_BF16 = os.environ.get("UFORMER_TPU_DWCONV_BF16") == "1"
# max images traced phase-interleaved per whole-image kernel step (2 =
# overlap one image's MXU phases with the other's VPU phases; 1 = off,
# for A/B). Read once at import, like the dwconv knob above.
_LEFF_ILEAVE = int(os.environ.get("UFORMER_TPU_LEFF_ILEAVE", "2"))


def _tap_dtype(x_dtype):
    """dtype for the 9-tap depthwise accumulations (forward recompute,
    dx taps): fp32 by default. bf16 tap accumulation (opt-in with
    UFORMER_TPU_DWCONV_BF16=1, read at import) MEASURED SLOWER on v5e —
    the whole-model A/B at 256²/bs8 read 47.0 ms (bf16 taps) vs 38.5 ms
    (f32 taps): the VPU emulates bf16 mul/add via f32 with pack/unpack
    passes, so "dropping the converts" actually adds them. Weight-grad
    REDUCTIONS over H*W stay fp32 regardless."""
    if x_dtype == jnp.bfloat16 and _DWCONV_BF16:
        return jnp.bfloat16
    return jnp.float32


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf approximation (|err|<=1.5e-7)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


_ERF_POLY = (1.1033873441319648, -0.3090749331219953, 0.05824505638375671,
             -0.005567171091769563, 0.00020592371294296416)


def _erf_poly(z):
    """Odd-polynomial erf (|err| <= 7.4e-3 globally, < 1 bf16 ulp) — ~2x
    fewer VPU ops than the exp-based form; bf16-path only."""
    z2 = z * z
    c0, c1, c2, c3, c4 = _ERF_POLY
    p = c0 + z2 * (c1 + z2 * (c2 + z2 * (c3 + z2 * c4)))
    return jnp.clip(z * p, -1.0, 1.0)


def _gelu(x, cheap: bool = False):
    """erf-form GELU matching torch nn.GELU: exact rational poly (~1e-7)
    by default, cheap odd-poly (< 1 bf16 ulp) when `cheap` (bf16 kernels —
    dispatching on x.dtype is wrong there because fp32 accumulators flow
    in even on the bf16 path)."""
    xf = x.astype(jnp.float32)
    erf_fn = _erf_poly if cheap else _erf
    return (0.5 * xf * (1.0 + erf_fn(xf * (2.0 ** -0.5)))).astype(x.dtype)


_INV_SQRT_2PI = 0.3989422804014327


def _dgelu(h, cheap: bool = False):
    """d/dh gelu(h) = Phi(h) + h * phi(h), fp32 out."""
    hf = h.astype(jnp.float32)
    erf_fn = _erf_poly if cheap else _erf
    Phi = 0.5 * (1.0 + erf_fn(hf * (2.0 ** -0.5)))
    phi = jnp.exp(-0.5 * hf * hf) * _INV_SQRT_2PI
    return Phi + hf * phi


def _gelu_and_dgelu(h, cheap: bool = False):
    """(gelu(h), d gelu(h)/dh) sharing one erf evaluation — the backward
    kernels need both of the SAME pre-activation (a2 for dw2, dgelu for
    dhc); computing them separately would run the erf polynomial twice
    over the hidden volume. fp32 in/out."""
    hf = h.astype(jnp.float32)
    erf_fn = _erf_poly if cheap else _erf
    Phi = 0.5 * (1.0 + erf_fn(hf * (2.0 ** -0.5)))
    phi = jnp.exp(-0.5 * hf * hf) * _INV_SQRT_2PI
    return hf * Phi, Phi + hf * phi


def _packed_helpers(W, C, Ch, p, has_ln, x_dtype):
    """Shared packed-lane helpers for every LeFF kernel family (row-tiled
    and whole-image, forward and backward). In pixel-packed mode (p > 1)
    W/C/Ch are the PACKED dims: p image pixels share one packed column,
    each owning a cq/chq lane slot.

    Returns (tap, ln_apply, ln_stats, group_mean, shift_fill):
      tap(hs, ddx)        ddx in {0,1,2}: conv tap (rows, W, Ch) of a
                          ring-padded (rows, W+2, Ch) slab. Packed: the
                          x-neighbour pixel lives one chq-lane slot over
                          (a +-chq lane roll = register renaming when chq
                          is a multiple of 128); slot 0/p-1 wrap into the
                          adjacent packed column via the shifted slice.
      shift_fill(hs)      packed only (None if p == 1): build BOTH
                          x-neighbour copies (L, R), each (rows, W, Ch),
                          of the full slab in one pass per side. A kernel
                          that stores these to scratch turns every
                          subsequent ddx=0/2 tap into a plain row slice —
                          the per-tap roll+select (~3 VPU ops instead of
                          1) otherwise runs 6x per 9-tap conv, and the
                          backward convolves three times (27 taps).
      ln_apply(tok, s, b, prec)      LN'd tokens in tok.dtype.
      ln_stats(tok, s, b, prec)      (t, that fp32, rsig fp32) for the
                                     backward; that/rsig None if no LN.
      group_mean(v, prec)            per-pixel mean within each packed
                                     slot group, fp32 (packed LN: lane
                                     reductions cannot cross the cq-lane
                                     slot groups, so the mean is an MXU
                                     pass against a block-diagonal 1/cq
                                     matrix that lands each pixel's mean
                                     broadcast into its own lanes).
    """
    cq = C // p
    chq = Ch // p
    f32 = jnp.float32

    def tap(hs, ddx):
        if p == 1:
            return hs[:, ddx:ddx + W]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Ch), 2)
        ctr = hs[:, 1:W + 1]
        if ddx == 1:
            return ctr
        if ddx == 0:
            A = jnp.roll(hs, chq, axis=2)
            return jnp.where(lane < chq, A[:, 0:W], A[:, 1:W + 1])
        Bv = jnp.roll(hs, -chq, axis=2)
        return jnp.where(lane >= (p - 1) * chq, Bv[:, 2:W + 2],
                         Bv[:, 1:W + 1])

    if p == 1:
        shift_fill = None
    else:
        def shift_fill(hs):
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Ch), 2)
            A = jnp.roll(hs, chq, axis=2)
            L = jnp.where(lane < chq, A[:, 0:W], A[:, 1:W + 1])
            Bv = jnp.roll(hs, -chq, axis=2)
            R = jnp.where(lane >= (p - 1) * chq, Bv[:, 2:W + 2],
                          Bv[:, 1:W + 1])
            return L, R

    def group_mean_mat(dtype):
        li = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
        lj = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
        return jnp.where(li // cq == lj // cq, 1.0 / cq, 0.0).astype(dtype)

    def ln_stats(tok, ln_s, ln_b, prec):
        if not has_ln:
            return tok, None, None
        tf = tok.astype(f32)
        if p == 1:
            mu = tf.mean(-1, keepdims=True)
            var = tf.var(-1, keepdims=True)
            rsig = jax.lax.rsqrt(var + 1e-5)
            that = (tf - mu) * rsig
        else:
            mmat = group_mean_mat(tok.dtype)
            mu = jax.lax.dot_general(
                tok, mmat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec)
            cen = tf - mu
            cb = cen.astype(tok.dtype)
            var = jax.lax.dot_general(
                cb * cb, mmat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec)
            rsig = jax.lax.rsqrt(var + 1e-5)
            that = cen * rsig
        t = (that * ln_s.astype(f32) + ln_b.astype(f32)).astype(tok.dtype)
        return t, that, rsig

    def ln_apply(tok, ln_s, ln_b, prec):
        return ln_stats(tok, ln_s, ln_b, prec)[0]

    def group_mean(v, prec):
        if p == 1:
            return v.mean(-1, keepdims=True)
        mmat = group_mean_mat(x_dtype)
        return jax.lax.dot_general(
            v.astype(x_dtype), mmat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec)

    return tap, ln_apply, ln_stats, group_mean, shift_fill


def overlapped_tiles(xp: jnp.ndarray, Th: int) -> jnp.ndarray:
    """(B, Hp+2, W+2, C) -> (B, nT, Th+2, W+2, C) with 2-row overlap."""
    H = xp.shape[1] - 2
    nT = H // Th
    idx = (jnp.arange(nT)[:, None] * Th + jnp.arange(Th + 2)[None]).reshape(-1)
    tiles = jnp.take(xp, idx, axis=1)
    return tiles.reshape(xp.shape[0], nT, Th + 2, *xp.shape[2:])


def _make_kernel(Th: int, H: int, Hp: int, W: int, C: int, Ch: int,
                 has_ln: bool, residual: bool, out_dtype,
                 conv_f32: bool = True, chunk_target: int = 1, p: int = 1):
    """p > 1 = pixel-packed mode: W/C/Ch are the PACKED dims (W = true_W/p
    packed columns, C = p*true_C lanes, Ch = p*true_Ch lanes; weights
    arrive kron/tile-expanded). Narrow true_C stages (32/64) DMA 10-30x
    slower than 128-lane rows (measured: a copy-only kernel on
    (8,256,256,32) costs 1.66 ms vs 0.055 ms packed) — packing keeps every
    HBM row and every VPU/MXU op at full 128 lanes."""
    cheap = out_dtype == jnp.bfloat16
    acc_dtype = jnp.float32 if conv_f32 else out_dtype
    tap, ln_apply, _, _, shift_fill = _packed_helpers(W, C, Ch, p, has_ln,
                                                      out_dtype)

    # Row-chunked pipeline: the LeFF chain (matmul -> GELU -> 9-tap conv ->
    # GELU -> matmul) is a strict MXU->VPU->VPU->MXU dependency per tile,
    # which would serialize the two units. Splitting the tile into row
    # chunks makes chunk i's VPU work independent of chunk i+1's MXU work,
    # letting Mosaic's scheduler overlap them (measured win; the chunks
    # share the VMEM-resident hidden so the conv halo is free). Measured
    # end-to-end neutral on Uformer_B at target 4 with a 4x compile-time
    # cost, so the default stays 1 (single chunk); kept for per-stage
    # tuning.
    def _row_chunks(total, target=chunk_target):
        """Split `total` rows into ~`target` sublane-aligned chunks:
        [(start, rows), ...] with every chunk but the last a multiple of
        8 rows (misaligned chunk starts defeat Mosaic's tiling)."""
        size = max(((total + target - 1) // target + 7) // 8 * 8, 8)
        chunks = []
        r = 0
        while r < total:
            rows = min(size, total - r)
            if 0 < total - r - rows < 8:
                rows = total - r  # absorb a sub-tile tail into this chunk
            chunks.append((r, rows))
            r += rows
        return chunks

    def kernel(xm_ref, xa_ref, xb_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref,
               wd_ref, bd_ref, w2_ref, b2_ref, o_ref, hid_ref,
               hidL_ref=None, hidR_ref=None):
        t = pl.program_id(1)
        xm = xm_ref[0]  # (Th, W, C) tile rows
        # assemble the +-1-row halo from the neighbouring 8-row blocks
        # (clamped at the image edges — the conv ring mask zeroes whatever
        # lands outside the image) and the zero W-pad ring
        xt = jnp.concatenate([xa_ref[0, 7:8], xm, xb_ref[0, 0:1]], axis=0)
        zc = jnp.zeros((Th + 2, 1, C), xt.dtype)
        xt = jnp.concatenate([zc, xt, zc], axis=1)  # (Th+2, W+2, C)
        prec = (jax.lax.Precision.HIGHEST
                if xt.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)

        # phase A: hidden = gelu(LN(x) @ w1 + b1), chunked over rows.
        # (Packed LN via MXU group-mean — measured: the lane-slice LN it
        # replaced cost ~1.8 ms/stage at 256². See _packed_helpers.)
        for r0, rows_a in _row_chunks(Th + 2):
            tok = ln_apply(xt[r0:r0 + rows_a].reshape(rows_a * (W + 2), C),
                           ln_s_ref[:], ln_b_ref[:], prec)
            h = jax.lax.dot_general(
                tok, w1_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            h = _gelu(h + b1_ref[:].astype(jnp.float32), cheap=cheap)
            hid_ref[r0:r0 + rows_a] = h.reshape(rows_a, W + 2, Ch) \
                .astype(xt.dtype)

        # zero the conv padding ring with targeted writes (the reference
        # zero-pads *after* linear1+GELU, where gelu(b1) != 0 would
        # otherwise leak in). Replaces a full-tensor iota mask multiply —
        # the ring is O(edge), the mask was O(everything).
        zrow = jnp.zeros((1, W + 2, Ch), xt.dtype)
        hid_ref[:, 0:1, :] = jnp.zeros((Th + 2, 1, Ch), xt.dtype)
        hid_ref[:, W + 1:W + 2, :] = jnp.zeros((Th + 2, 1, Ch), xt.dtype)

        @pl.when(t == 0)
        def _zero_top():
            hid_ref[0:1] = zrow

        n_bot = Hp - H + 1  # image-bottom halo row + any 8-alignment pad
        @pl.when(t == pl.num_programs(1) - 1)
        def _zero_bottom():
            hid_ref[Th + 2 - n_bot:Th + 2] = jnp.zeros(
                (n_bot, W + 2, Ch), xt.dtype)

        # packed: materialize the two x-neighbour copies once so the 6
        # off-centre taps below are plain row slices (see shift_fill)
        if hidL_ref is not None:
            L, R = shift_fill(hid_ref[:])
            hidL_ref[:] = L
            hidR_ref[:] = R

        # phase B: out = gelu(dwconv3x3(hidden)) @ w2 + b2, chunked over
        # rows (the +-1-row conv halo reads the shared hidden scratch)
        for r0, rows_b in _row_chunks(Th):
            acc = jnp.zeros((rows_b, W, Ch), acc_dtype)
            for dy in range(3):
                if hidL_ref is not None:
                    sl = slice(r0 + dy, r0 + dy + rows_b)
                    srcs = (hidL_ref[sl], hid_ref[sl, 1:W + 1],
                            hidR_ref[sl])
                    for dx in range(3):
                        acc += srcs[dx].astype(acc_dtype) * \
                            wd_ref[dy, dx, :].astype(acc_dtype)
                    continue
                hs = hid_ref[r0 + dy:r0 + dy + rows_b]  # (rows, W+2, Ch)
                for dx in range(3):
                    acc += tap(hs, dx).astype(acc_dtype) * \
                        wd_ref[dy, dx, :].astype(acc_dtype)
            acc = _gelu(acc + bd_ref[:].astype(acc_dtype), cheap=cheap)
            out = jax.lax.dot_general(
                acc.astype(xt.dtype).reshape(rows_b * W, Ch), w2_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            out = out + b2_ref[:].astype(jnp.float32)
            out = out.reshape(rows_b, W, C)
            if residual:
                out = out + xm[r0:r0 + rows_b].astype(jnp.float32)
            o_ref[0, r0:r0 + rows_b] = out.astype(out_dtype)

    return kernel


def _make_smallimg_kernel(Bt, H0, H, W, C, Ch, has_ln, residual, out_dtype,
                          p, conv_f32=None, ileave=1):
    """Whole-image batch-tiled forward: Bt small images per grid step (an
    unrolled in-kernel loop). At 8²-64² stage geometries the row-tiled
    kernel degenerates to one tiny tile per step and per-step overhead
    dominates; here a step amortizes it over Bt images and needs no halo
    logic at all (the conv ring is an in-VMEM zero pad per image).

    `ileave`: images traced phase-interleaved per loop iteration, each
    with its own (H+2)-row slab of the hidden scratch — the per-image
    chain is strictly serial (LN -> matmul -> gelu -> taps -> gelu ->
    matmul), so one image's MXU phases overlap the other's VPU phases
    (same rationale as stage.py's 2-image interleave)."""
    cheap = out_dtype == jnp.bfloat16
    f32 = jnp.float32
    acc_dt = (_tap_dtype(out_dtype) if conv_f32 is None
              else (f32 if conv_f32 else out_dtype))
    tap, ln_apply, _, _, shift_fill = _packed_helpers(W, C, Ch, p, has_ln,
                                                      out_dtype)
    il = ileave
    Hs = H + 2  # slab rows per in-flight image

    def kernel(xm_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, wd_ref, bd_ref,
               w2_ref, b2_ref, o_ref, hid_ref, hidL_ref=None,
               hidR_ref=None):
        prec = (jax.lax.Precision.HIGHEST
                if xm_ref.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)

        def ph_hidden(bi, u):
            """LN -> w1 matmul -> gelu -> hidden slab u (+ tap copies)."""
            r0 = u * Hs
            xi = xm_ref[bi]  # (H, W, C)
            tok = ln_apply(xi.reshape(H * W, C), ln_s_ref[:], ln_b_ref[:],
                           prec)
            h = jax.lax.dot_general(
                tok, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec)
            h = _gelu(h + b1_ref[:].astype(f32), cheap=cheap) \
                .astype(xi.dtype).reshape(H, W, Ch)
            zcol = jnp.zeros((H, 1, Ch), xi.dtype)
            hid_ref[r0:r0 + 1] = jnp.zeros((1, W + 2, Ch), xi.dtype)
            hid_ref[r0 + 1:r0 + H + 1] = jnp.concatenate(
                [zcol, h, zcol], axis=1)
            hid_ref[r0 + H0 + 1:r0 + H + 2] = jnp.zeros(
                (H - H0 + 1, W + 2, Ch), xi.dtype)
            if hidL_ref is not None:
                Lv, Rv = shift_fill(hid_ref[r0:r0 + Hs])
                hidL_ref[r0:r0 + Hs] = Lv
                hidR_ref[r0:r0 + Hs] = Rv

        def ph_out(bi, u):
            """taps -> gelu -> w2 matmul -> residual -> output row bi."""
            r0 = u * Hs
            xi = xm_ref[bi]
            acc = jnp.zeros((H, W, Ch), acc_dt)
            for dy in range(3):
                if hidL_ref is not None:
                    sl = slice(r0 + dy, r0 + dy + H)
                    srcs = (hidL_ref[sl], hid_ref[sl, 1:W + 1],
                            hidR_ref[sl])
                    for dx in range(3):
                        acc += srcs[dx].astype(acc_dt) * \
                            wd_ref[dy, dx, :].astype(acc_dt)
                    continue
                rows3 = hid_ref[r0 + dy:r0 + dy + H]
                for dx in range(3):
                    acc += tap(rows3, dx).astype(acc_dt) * \
                        wd_ref[dy, dx, :].astype(acc_dt)
            acc = _gelu(acc.astype(f32) + bd_ref[:].astype(f32),
                        cheap=cheap)
            out = jax.lax.dot_general(
                acc.astype(xi.dtype).reshape(H * W, Ch), w2_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec)
            out = (out + b2_ref[:].astype(f32)).reshape(H, W, C)
            if residual:
                out = out + xi.astype(f32)
            o_ref[bi] = out.astype(out_dtype)

        for base in range(0, Bt, il):
            for u in range(il):
                ph_hidden(base + u, u)
            for u in range(il):
                ph_out(base + u, u)

    return kernel


def _smallimg_bt(B, H, W, C, Ch, itemsize, n_tiles=2, scratch_mb=4, p=1,
                 il=1):
    """Pick a batch tile for whole-image mode, or 0 to use row tiling:
    the per-image hidden scratch must be small and Bt images' I/O tiles
    must fit comfortably. `il` in-flight interleaved images multiply the
    scratch and the tile must pair up (bt % il == 0)."""
    scratch = (H + 2) * (W + 2) * max(Ch, 128) * itemsize
    if p > 1:  # the two x-neighbour tap scratches (shift_fill)
        scratch += 2 * (H + 2) * W * max(Ch, 128) * itemsize
    if il * scratch > scratch_mb * 2**20:
        return 0
    per_img = H * W * max(C, 128) * itemsize * n_tiles
    bt = max(1, min(B, (8 * 2**20) // max(per_img, 1)))
    while B % bt or bt % il:
        bt -= 1
        if bt == 0:
            return 0
    return bt


def _smallimg_plan(B, H, W, C, Ch, itemsize, n_tiles, scratch_mb, p):
    """(bt, il): batch tile + phase-interleave width for whole-image mode.
    Two images in flight when the batch pairs up; the scratch budget is
    per in-flight image (whole-image eligibility must not shrink when the
    interleave doubles the slabs — total VMEM stays well under the 50 MB
    kernel limit)."""
    if B % 2 == 0 and _LEFF_ILEAVE >= 2:
        bt = _smallimg_bt(B, H, W, C, Ch, itemsize, n_tiles=n_tiles,
                          scratch_mb=2 * scratch_mb, p=p, il=2)
        if bt:
            return bt, 2
    return _smallimg_bt(B, H, W, C, Ch, itemsize, n_tiles=n_tiles,
                        scratch_mb=scratch_mb, p=p, il=1), 1


def _pick_th(H: int, W: int, Ch: int, itemsize: int,
             budget: int | None = None, C: int = 0, p: int = 1) -> int:
    """Tile height: the hidden tile (Th+2, W+2, Ch) dominates VMEM; keep it
    (plus the fp32 conv accumulator and the folded-LN fp32 token copy,
    both lane-padded to 128) under budget. The neighbour-block halo scheme
    needs Th to be a multiple-of-8 divisor of H (H pre-padded to 8)."""
    if budget is None:  # fp32 tiles are 2x + HIGHEST-precision scratch
        budget = (10 if itemsize <= 2 else 4) * 2**20
    # hid scratch + f32 conv acc + f32 gelu temps on the hidden width
    per_row = (W + 2) * max(Ch, 128) * (itemsize + 4 + 4)
    # x tile/halo/assembled copies (double-buffered) + LN f32 temp
    per_row += (W + 2) * max(C, 128) * (4 + 5 * itemsize)
    if p > 1:  # the two x-neighbour tap scratches (shift_fill)
        per_row += 2 * W * max(Ch, 128) * itemsize
    th = max(budget // max(per_row, 1) - 2, 8)
    th = min(th // 8 * 8, H)
    while H % th or th % 8:
        th -= 8
    return max(th, 8)


def leff_reference(x, w1, b1, wd, bd, w2, b2, ln_s=None, ln_b=None,
                   residual=False):
    """jnp reference of the fused pipeline (for CPU, tests, and the
    backward pass). Optional folded pre-LayerNorm and block residual."""
    from uformer_tpu.ops.dwconv import _depthwise_conv2d_jnp

    def g(v):
        return jax.nn.gelu(v, approximate=False)

    x0 = x
    if ln_s is not None:
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        x = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)
             * ln_s.astype(jnp.float32)
             + ln_b.astype(jnp.float32)).astype(x.dtype)
    y = (x @ w1.astype(x.dtype)) + b1.astype(x.dtype)
    y = g(y)
    y = _depthwise_conv2d_jnp(y, wd, bd)
    y = g(y)
    y = (y @ w2.astype(x.dtype)) + b2.astype(x.dtype)
    return x0 + y if residual else y


def _make_bwd_kernel(Th, H0, Hp, W, C, Ch, nT, has_ln, residual, x_dtype,
                     p, conv_f32=None):
    """Fused LeFF backward: recompute the forward intermediates on
    VMEM-resident tiles (flash-style) and emit dx plus all weight grads in
    one pass. Covers the VJP of :func:`leff_reference` exactly.

    Grid (B, nT); weight-grad outputs use constant index maps (the block
    stays VMEM-resident across the whole sequential TPU grid) and are
    accumulated in fp32, initialized at the global first step.

    Halo scheme mirrors the forward: da1 row r needs dhc rows r-1..r+1;
    dhc row r needs a1 rows r-1..r+1 and dy row r; so x is read with a
    +-2-row and dy with a +-1-row halo via the 8-row neighbour blocks.
    Out-of-image halo rows are zeroed explicitly (top/bottom edge tiles),
    matching the forward's zero conv ring — pad rows contribute nothing
    to any gradient."""
    cheap = x_dtype == jnp.bfloat16
    f32 = jnp.float32
    acc_dt = (_tap_dtype(x_dtype) if conv_f32 is None
              else (f32 if conv_f32 else x_dtype))
    tap, _, ln_stats, group_mean, shift_fill = _packed_helpers(
        W, C, Ch, p, has_ln, x_dtype)

    def kernel(xm_ref, xa_ref, xb_ref, dym_ref, dya_ref, dyb_ref,
               ln_s_ref, ln_b_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref,
               dx_ref, dw1_ref, db1_ref, dwd_ref, dbd_ref, dw2_ref,
               db2_ref, dls_ref, dlb_ref, a1e_ref, dhce_ref,
               a1eL_ref=None, a1eR_ref=None, dhceL_ref=None,
               dhceR_ref=None):
        b = pl.program_id(0)
        t = pl.program_id(1)
        xm = xm_ref[0]
        prec = (jax.lax.Precision.HIGHEST if xm.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)

        @pl.when(jnp.logical_and(b == 0, t == 0))
        def _init():
            dw1_ref[:] = jnp.zeros(dw1_ref.shape, f32)
            db1_ref[:] = jnp.zeros(db1_ref.shape, f32)
            dwd_ref[:] = jnp.zeros(dwd_ref.shape, f32)
            dbd_ref[:] = jnp.zeros(dbd_ref.shape, f32)
            dw2_ref[:] = jnp.zeros(dw2_ref.shape, f32)
            db2_ref[:] = jnp.zeros(db2_ref.shape, f32)
            dls_ref[:] = jnp.zeros(dls_ref.shape, f32)
            dlb_ref[:] = jnp.zeros(dlb_ref.shape, f32)

        # ---- phase 1: a1e = gelu(LN(x) @ w1 + b1) on Th+4 rows + ring
        xe = jnp.concatenate([xa_ref[0, 6:8], xm, xb_ref[0, 0:2]], axis=0)
        zc = jnp.zeros((Th + 4, 1, C), xm.dtype)
        xe = jnp.concatenate([zc, xe, zc], axis=1)  # (Th+4, W+2, C)
        toke = xe.reshape((Th + 4) * (W + 2), C)
        te, _, _ = ln_stats(toke, ln_s_ref[:], ln_b_ref[:], prec)
        h = jax.lax.dot_general(
            te, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec)
        a1 = _gelu(h + b1_ref[:].astype(f32), cheap=cheap)
        a1e_ref[:] = a1.reshape(Th + 4, W + 2, Ch).astype(xm.dtype)
        a1e_ref[:, 0:1, :] = jnp.zeros((Th + 4, 1, Ch), xm.dtype)
        a1e_ref[:, W + 1:W + 2, :] = jnp.zeros((Th + 4, 1, Ch), xm.dtype)

        @pl.when(t == 0)
        def _zero_top_a1():
            a1e_ref[0:2] = jnp.zeros((2, W + 2, Ch), xm.dtype)

        n_bot_a = min(Hp - H0 + 2, Th + 4)
        @pl.when(t == nT - 1)
        def _zero_bot_a1():
            a1e_ref[Th + 4 - n_bot_a:] = jnp.zeros(
                (n_bot_a, W + 2, Ch), xm.dtype)

        packed = a1eL_ref is not None
        if packed:  # x-neighbour copies once; 18 a1 taps become slices
            Lv, Rv = shift_fill(a1e_ref[:])
            a1eL_ref[:] = Lv
            a1eR_ref[:] = Rv

        def tap3(ref, L_ref, R_ref, r0, rows, ddx):
            if packed:
                sl = slice(r0, r0 + rows)
                return (L_ref[sl], ref[sl, 1:W + 1], R_ref[sl])[ddx]
            return tap(ref[r0:r0 + rows], ddx)

        # ---- phase 2: dhc on Th+2 rows; dw2/db2/dwd/dbd on own rows
        dye = jnp.concatenate(
            [dya_ref[0, 7:8], dym_ref[0], dyb_ref[0, 0:1]], axis=0)
        ri = jax.lax.broadcasted_iota(jnp.int32, (Th + 2, 1, 1), 0)
        absr = t * Th - 1 + ri
        dye = jnp.where((absr >= 0) & (absr < H0), dye, 0)
        g2 = jax.lax.dot_general(  # dy @ w2^T: (n, C) x (Ch, C) -> (n, Ch)
            dye.reshape((Th + 2) * W, C), w2_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=prec)
        acc = jnp.zeros((Th + 2, W, Ch), acc_dt)
        for ddy in range(3):
            for ddx in range(3):
                acc += tap3(a1e_ref, a1eL_ref, a1eR_ref, ddy, Th + 2,
                            ddx).astype(acc_dt) * \
                    wd_ref[ddy, ddx, :].astype(acc_dt)
        hc = acc.astype(f32) + bd_ref[:].astype(f32)
        # gelu(hc) and dgelu(hc) share one erf pass (see _gelu_and_dgelu)
        a2_full, dg = _gelu_and_dgelu(hc, cheap=cheap)
        dhc = dg * g2.reshape(Th + 2, W, Ch)
        dhce_ref[:, 1:W + 1, :] = dhc.astype(xm.dtype)
        dhce_ref[:, 0:1, :] = jnp.zeros((Th + 2, 1, Ch), xm.dtype)
        dhce_ref[:, W + 1:W + 2, :] = jnp.zeros((Th + 2, 1, Ch), xm.dtype)
        if packed:
            Lv, Rv = shift_fill(dhce_ref[:])
            dhceL_ref[:] = Lv
            dhceR_ref[:] = Rv

        a2_own = a2_full[1:Th + 1].astype(xm.dtype)
        dy_own = dye[1:Th + 1]
        dw2_ref[:] += jax.lax.dot_general(
            a2_own.reshape(Th * W, Ch), dy_own.reshape(Th * W, C),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec)
        db2_ref[:] += jnp.sum(dy_own.astype(f32),
                              axis=(0, 1)).reshape(1, C)
        dhc_own = dhc[1:Th + 1]
        dbd_ref[:] += jnp.sum(dhc_own, axis=(0, 1)).reshape(1, Ch)
        # tap products in acc_dt (inputs are already that dtype); the
        # HxW reduction itself accumulates fp32
        dhc_own_t = dhc_own.astype(acc_dt)
        for ddy in range(3):
            for ddx in range(3):
                a1t = tap3(a1e_ref, a1eL_ref, a1eR_ref, 1 + ddy, Th,
                           ddx).astype(acc_dt)
                dwd_ref[ddy, ddx, :] += jnp.sum(
                    (a1t * dhc_own_t).astype(f32), axis=(0, 1))

        # ---- phase 3: da1 -> dh1 -> dw1/db1/dt -> LN backward -> dx
        da1 = jnp.zeros((Th, W, Ch), acc_dt)
        for ddy in range(3):
            for ddx in range(3):
                da1 += tap3(dhce_ref, dhceL_ref, dhceR_ref, 2 - ddy, Th,
                            2 - ddx).astype(acc_dt) * \
                    wd_ref[ddy, ddx, :].astype(acc_dt)
        tok_own = xm.reshape(Th * W, C)
        t_own, that, rsig = ln_stats(tok_own, ln_s_ref[:], ln_b_ref[:],
                                     prec)
        h1_own = jax.lax.dot_general(
            t_own, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec) \
            + b1_ref[:].astype(f32)
        dh1 = da1.reshape(Th * W, Ch) * _dgelu(h1_own, cheap=cheap)
        if Hp != H0:
            ro = jax.lax.broadcasted_iota(jnp.int32, (Th, 1, 1), 0)
            dh1 = jnp.where((t * Th + ro < H0),
                            dh1.reshape(Th, W, Ch), 0).reshape(Th * W, Ch)
        dh1c = dh1.astype(xm.dtype)
        dw1_ref[:] += jax.lax.dot_general(
            t_own, dh1c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec)
        db1_ref[:] += jnp.sum(dh1, axis=0).reshape(1, Ch)
        dt = jax.lax.dot_general(  # dh1 @ w1^T
            dh1c, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=prec)
        if has_ln:
            dls_ref[:] += jnp.sum(dt * that, axis=0).reshape(1, C)
            dlb_ref[:] += jnp.sum(dt, axis=0).reshape(1, C)
            dth = dt * ln_s_ref[:].astype(f32)
            m1 = group_mean(dth, prec)
            m2 = group_mean(dth * that, prec)
            dxv = (dth - m1 - that * m2) * rsig
        else:
            dxv = dt
        dxv = dxv.reshape(Th, W, C)
        if residual:
            dxv = dxv + dy_own.astype(f32)
        dx_ref[0] = dxv.astype(xm.dtype)

    return kernel


def _make_smallimg_bwd_kernel(Bt, H0, H, W, C, Ch, has_ln, residual,
                              x_dtype, p, conv_f32=None, ileave=1):
    """Whole-image batch-tiled backward: Bt images per grid step, no halo
    logic (ring zeros per image), fp32 weight-grad accumulators in
    constant-index output blocks.

    `ileave`: images traced phase-interleaved per loop iteration, each
    with its own (H+2)-row slab of the a1/dhc scratches, so one image's
    MXU phases overlap the other's VPU tap/gelu phases (the weight-grad
    `+=`s serialize only against each other). h1 is recomputed in phase 3
    instead of carried — one extra matmul on the idle MXU instead of a
    (H*W, Ch) fp32 live range spanning two phases per in-flight image."""
    cheap = x_dtype == jnp.bfloat16
    f32 = jnp.float32
    acc_dt = (_tap_dtype(x_dtype) if conv_f32 is None
              else (f32 if conv_f32 else x_dtype))
    tap, _, ln_stats, group_mean, shift_fill = _packed_helpers(
        W, C, Ch, p, has_ln, x_dtype)
    il = ileave
    Hs = H + 2

    def kernel(xm_ref, dym_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref,
               wd_ref, bd_ref, w2_ref,
               dx_ref, dw1_ref, db1_ref, dwd_ref, dbd_ref, dw2_ref,
               db2_ref, dls_ref, dlb_ref, a1e_ref, dhce_ref,
               a1eL_ref=None, a1eR_ref=None, dhceL_ref=None,
               dhceR_ref=None):
        packed = a1eL_ref is not None
        prec = (jax.lax.Precision.HIGHEST
                if xm_ref.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)

        def tap3(ref, L_ref, R_ref, r0, rows, ddx):
            if packed:
                sl = slice(r0, r0 + rows)
                return (L_ref[sl], ref[sl, 1:W + 1], R_ref[sl])[ddx]
            return tap(ref[r0:r0 + rows], ddx)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in (dw1_ref, db1_ref, dwd_ref, dbd_ref, dw2_ref,
                      db2_ref, dls_ref, dlb_ref):
                r[:] = jnp.zeros(r.shape, r.dtype)

        def load_dy(bi):
            dyi = dym_ref[bi]
            if H != H0:
                ri = jax.lax.broadcasted_iota(jnp.int32, (H, 1, 1), 0)
                dyi = jnp.where(ri < H0, dyi, 0)
            return dyi

        def ph1(bi, u):
            """a1 (post-act) with ring + pad-row zeros -> slab u; carries
            (tok, that, rsig) for phase 3."""
            r0 = u * Hs
            xi = xm_ref[bi]
            tok, that, rsig = ln_stats(xi.reshape(H * W, C), ln_s_ref[:],
                                       ln_b_ref[:], prec)
            h1 = jax.lax.dot_general(
                tok, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec) \
                + b1_ref[:].astype(f32)
            a1 = _gelu(h1, cheap=cheap).astype(xi.dtype).reshape(H, W, Ch)
            zcol = jnp.zeros((H, 1, Ch), xi.dtype)
            a1e_ref[r0:r0 + 1] = jnp.zeros((1, W + 2, Ch), xi.dtype)
            a1e_ref[r0 + 1:r0 + H + 1] = jnp.concatenate(
                [zcol, a1, zcol], axis=1)
            a1e_ref[r0 + H0 + 1:r0 + H + 2] = jnp.zeros(
                (H - H0 + 1, W + 2, Ch), xi.dtype)
            if packed:
                Lv, Rv = shift_fill(a1e_ref[r0:r0 + Hs])
                a1eL_ref[r0:r0 + Hs] = Lv
                a1eR_ref[r0:r0 + Hs] = Rv
            return tok, that, rsig

        def ph2(bi, u, dyi):
            """hc -> dhc -> slab u; dw2/db2/dwd/dbd accumulation."""
            r0 = u * Hs
            xi = xm_ref[bi]
            zcol = jnp.zeros((H, 1, Ch), xi.dtype)
            g2 = jax.lax.dot_general(
                dyi.reshape(H * W, C), w2_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=prec)
            acc = jnp.zeros((H, W, Ch), acc_dt)
            for ddy in range(3):
                for ddx in range(3):
                    acc += tap3(a1e_ref, a1eL_ref, a1eR_ref, r0 + ddy, H,
                                ddx).astype(acc_dt) * \
                        wd_ref[ddy, ddx, :].astype(acc_dt)
            hc = acc.astype(f32) + bd_ref[:].astype(f32)
            # gelu(hc) and dgelu(hc) share one erf pass
            a2f, dg = _gelu_and_dgelu(hc, cheap=cheap)
            dhc = dg * g2.reshape(H, W, Ch)
            dhce_ref[r0:r0 + 1] = jnp.zeros((1, W + 2, Ch), xi.dtype)
            dhce_ref[r0 + 1:r0 + H + 1] = jnp.concatenate(
                [zcol, dhc.astype(xi.dtype), zcol], axis=1)
            dhce_ref[r0 + H + 1:r0 + H + 2] = jnp.zeros(
                (1, W + 2, Ch), xi.dtype)
            if packed:
                Lv, Rv = shift_fill(dhce_ref[r0:r0 + Hs])
                dhceL_ref[r0:r0 + Hs] = Lv
                dhceR_ref[r0:r0 + Hs] = Rv

            a2 = a2f.astype(xi.dtype)
            dw2_ref[:] += jax.lax.dot_general(
                a2.reshape(H * W, Ch), dyi.reshape(H * W, C),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec)
            db2_ref[:] += jnp.sum(dyi.astype(f32), axis=(0, 1)) \
                .reshape(1, C)
            dbd_ref[:] += jnp.sum(dhc, axis=(0, 1)).reshape(1, Ch)
            # tap products in acc_dt; the HxW reduction stays fp32
            dhc_t = dhc.astype(acc_dt)
            for ddy in range(3):
                for ddx in range(3):
                    a1t = tap3(a1e_ref, a1eL_ref, a1eR_ref, r0 + ddy, H,
                               ddx).astype(acc_dt)
                    dwd_ref[ddy, ddx, :] += jnp.sum(
                        (a1t * dhc_t).astype(f32), axis=(0, 1))

        def ph3(bi, u, dyi, tok, that, rsig):
            """da1 -> dh1 -> dw1/db1/dt -> LN bwd -> dx (h1 recomputed)."""
            r0 = u * Hs
            xi = xm_ref[bi]
            da1 = jnp.zeros((H, W, Ch), acc_dt)
            for ddy in range(3):
                for ddx in range(3):
                    da1 += tap3(dhce_ref, dhceL_ref, dhceR_ref,
                                r0 + 2 - ddy, H, 2 - ddx).astype(acc_dt) * \
                        wd_ref[ddy, ddx, :].astype(acc_dt)
            h1 = jax.lax.dot_general(
                tok, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec) \
                + b1_ref[:].astype(f32)
            dh1 = da1.reshape(H * W, Ch) * _dgelu(h1, cheap=cheap)
            if H != H0:
                ro = jax.lax.broadcasted_iota(jnp.int32, (H, 1, 1), 0)
                dh1 = jnp.where(ro < H0, dh1.reshape(H, W, Ch), 0) \
                    .reshape(H * W, Ch)
            dh1c = dh1.astype(xi.dtype)
            dw1_ref[:] += jax.lax.dot_general(
                tok, dh1c, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec)
            db1_ref[:] += jnp.sum(dh1, axis=0).reshape(1, Ch)
            dt = jax.lax.dot_general(
                dh1c, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=prec)
            if has_ln:
                dls_ref[:] += jnp.sum(dt * that, axis=0).reshape(1, C)
                dlb_ref[:] += jnp.sum(dt, axis=0).reshape(1, C)
                dth = dt * ln_s_ref[:].astype(f32)
                m1 = group_mean(dth, prec)
                m2 = group_mean(dth * that, prec)
                dxv = (dth - m1 - that * m2) * rsig
            else:
                dxv = dt
            dxv = dxv.reshape(H, W, C)
            if residual:
                dxv = dxv + dyi.astype(f32)
            dx_ref[bi] = dxv.astype(xi.dtype)

        for base in range(0, Bt, il):
            us = list(range(il))
            dys = [load_dy(base + u) for u in us]
            st = [ph1(base + u, u) for u in us]
            for u in us:
                ph2(base + u, u, dys[u])
            for u in us:
                ph3(base + u, u, dys[u], *st[u])

    return kernel


@functools.partial(jax.jit, static_argnames=("has_ln", "residual",
                                             "interpret", "vmem_mb",
                                             "smallimg", "conv_f32"))
def fused_leff_bwd(x, dy, w1, b1, wd, bd, w2, ln_s, ln_b, *,
                   has_ln: bool = True, residual: bool = False,
                   interpret: bool = False, vmem_mb: int = 0,
                   smallimg: bool = True, conv_f32: bool | None = None):
    """VJP of the fused LeFF pipeline as ONE Pallas kernel.

    Returns (dx, dw1, db1, dwd, dbd, dw2, db2, dln_s, dln_b); weight
    grads in fp32. Same pixel-packing and H-padding rules as
    :func:`fused_leff`. `conv_f32` pins the tap-accumulation dtype (None
    = the import-time default)."""
    B, H, W, C = x.shape
    Ch = w1.shape[1]

    p = 1
    if C < 128 and 128 % C == 0:
        cand = 128 // C
        if W % cand == 0 and W // cand >= 2:
            p = cand
    C0, Ch0 = C, Ch
    if p > 1:
        eye = jnp.eye(p, dtype=w1.dtype)
        w1 = jnp.kron(eye, w1)
        w2 = jnp.kron(eye.astype(w2.dtype), w2)
        b1 = jnp.tile(b1, p)
        wd = jnp.tile(wd, (1, 1, p))
        bd = jnp.tile(bd, p)
        ln_s = jnp.tile(ln_s, p)
        ln_b = jnp.tile(ln_b, p)
        x = x.reshape(B, H, W // p, p * C)
        dy = dy.reshape(B, H, W // p, p * C)
        W, C, Ch = W // p, p * C, p * Ch

    H0 = H
    if H % 8:
        Hp = (H + 7) // 8 * 8
        pad = ((0, 0), (0, Hp - H), (0, 0), (0, 0))
        x = jnp.pad(x, pad)
        dy = jnp.pad(dy, pad)
        H = Hp
    f32 = jnp.float32
    bt, il = (_smallimg_plan(B, H, W, C, Ch, x.dtype.itemsize, 3,
                             6 if p > 1 else 2, p)
              if smallimg else (0, 1))
    if bt:
        kernel = _make_smallimg_bwd_kernel(bt, H0, H, W, C, Ch, has_ln,
                                           residual, x.dtype, p,
                                           conv_f32=conv_f32, ileave=il)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

        def btile():
            return pl.BlockSpec((bt, H, W, C), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)

        def const(*shape):
            zeros = (0,) * len(shape)
            return pl.BlockSpec(shape, lambda i: zeros,
                                memory_space=pltpu.VMEM)

        outs = pl.pallas_call(
            kernel,
            grid=(B // bt,),
            in_specs=[btile(), btile(),          # x, dy
                      vmem, vmem,                # ln_s, ln_b
                      vmem, vmem, vmem, vmem, vmem],  # w1, b1, wd, bd, w2
            out_specs=[
                btile(),
                const(C, Ch), const(1, Ch), const(3, 3, Ch), const(1, Ch),
                const(Ch, C), const(1, C), const(1, C), const(1, C),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
                jax.ShapeDtypeStruct((C, Ch), f32),
                jax.ShapeDtypeStruct((1, Ch), f32),
                jax.ShapeDtypeStruct((3, 3, Ch), f32),
                jax.ShapeDtypeStruct((1, Ch), f32),
                jax.ShapeDtypeStruct((Ch, C), f32),
                jax.ShapeDtypeStruct((1, C), f32),
                jax.ShapeDtypeStruct((1, C), f32),
                jax.ShapeDtypeStruct((1, C), f32),
            ],
            scratch_shapes=[pltpu.VMEM((il * (H + 2), W + 2, Ch), x.dtype),
                            pltpu.VMEM((il * (H + 2), W + 2, Ch), x.dtype)]
            + ([pltpu.VMEM((il * (H + 2), W, Ch), x.dtype)] * 4
               if p > 1 else []),
            interpret=interpret,
            compiler_params=(pltpu.CompilerParams(
                vmem_limit_bytes=50 * 2**20) if not interpret else None),
            cost_estimate=pl.CostEstimate(
                flops=6 * B * H * W * Ch * (2 * C + 9),
                bytes_accessed=3 * B * H * W * C * x.dtype.itemsize,
                transcendentals=4 * B * H * W * Ch,
            ),
        )(x, dy, ln_s, ln_b, w1, b1, wd, bd, w2)
        return _unpack_bwd_outs(outs, B, H, H0, W, C, Ch, C0, Ch0, p)

    budget = (vmem_mb * 2**20) if vmem_mb else 24 * 2**20
    # two hidden-size scratches + several fp32 hidden temps per row
    per_row = (W + 2) * max(Ch, 128) * (2 * x.dtype.itemsize + 20) \
        + (W + 2) * max(C, 128) * (4 + 6 * x.dtype.itemsize)
    if p > 1:  # four x-neighbour tap scratches (shift_fill)
        per_row += 4 * W * max(Ch, 128) * x.dtype.itemsize
    th = max(budget // max(per_row, 1) - 4, 8)
    th = min(th // 8 * 8, H)
    while H % th or th % 8:
        th -= 8
    Th = max(th, 8)
    nT = H // Th
    nB8 = H // 8
    k8 = Th // 8
    kernel = _make_bwd_kernel(Th, H0, H, W, C, Ch, nT, has_ln, residual,
                              x.dtype, p, conv_f32=conv_f32)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile = lambda: pl.BlockSpec((1, Th, W, C), lambda b, t: (b, t, 0, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    above = lambda: pl.BlockSpec(  # noqa: E731
        (1, 8, W, C), lambda b, t: (b, jnp.maximum(t * k8 - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    below = lambda: pl.BlockSpec(  # noqa: E731
        (1, 8, W, C),
        lambda b, t: (b, jnp.minimum(t * k8 + k8, nB8 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    def const(*shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda b, t: zeros,
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[tile(), above(), below(),      # x
                  tile(), above(), below(),      # dy
                  vmem, vmem,                    # ln_s, ln_b
                  vmem, vmem, vmem, vmem, vmem],  # w1, b1, wd, bd, w2
        out_specs=[
            pl.BlockSpec((1, Th, W, C), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            const(C, Ch), const(1, Ch), const(3, 3, Ch), const(1, Ch),
            const(Ch, C), const(1, C), const(1, C), const(1, C),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),   # dx
            jax.ShapeDtypeStruct((C, Ch), f32),            # dw1
            jax.ShapeDtypeStruct((1, Ch), f32),            # db1
            jax.ShapeDtypeStruct((3, 3, Ch), f32),         # dwd
            jax.ShapeDtypeStruct((1, Ch), f32),            # dbd
            jax.ShapeDtypeStruct((Ch, C), f32),            # dw2
            jax.ShapeDtypeStruct((1, C), f32),             # db2
            jax.ShapeDtypeStruct((1, C), f32),             # dln_s
            jax.ShapeDtypeStruct((1, C), f32),             # dln_b
        ],
        scratch_shapes=[pltpu.VMEM((Th + 4, W + 2, Ch), x.dtype),
                        pltpu.VMEM((Th + 2, W + 2, Ch), x.dtype)]
        + ([pltpu.VMEM((Th + 4, W, Ch), x.dtype),
            pltpu.VMEM((Th + 4, W, Ch), x.dtype),
            pltpu.VMEM((Th + 2, W, Ch), x.dtype),
            pltpu.VMEM((Th + 2, W, Ch), x.dtype)] if p > 1 else []),
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=int(max((vmem_mb or 24) * 2.5, 50)) * 2**20)
            if not interpret else None),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * W * Ch * (2 * C + 9),
            bytes_accessed=3 * B * H * W * C * x.dtype.itemsize,
            transcendentals=4 * B * H * W * Ch,
        ),
    )(x, x, x, dy, dy, dy, ln_s, ln_b, w1, b1, wd, bd, w2)
    return _unpack_bwd_outs(outs, B, H, H0, W, C, Ch, C0, Ch0, p)


def _unpack_bwd_outs(outs, B, H, H0, W, C, Ch, C0, Ch0, p):
    """Crop dx, fold packed weight grads back to true shapes."""
    dx, dw1, db1, dwd, dbd, dw2, db2, dls, dlb = outs
    if H != H0:
        dx = dx[:, :H0]
    if p > 1:
        dx = dx.reshape(B, H0, W * p, C // p)
        d4 = dw1.reshape(p, C0, p, Ch0)
        dw1 = sum(d4[s, :, s, :] for s in range(p))
        d4 = dw2.reshape(p, Ch0, p, C0)
        dw2 = sum(d4[s, :, s, :] for s in range(p))
        db1 = db1.reshape(p, Ch0).sum(0)
        dwd = dwd.reshape(3, 3, p, Ch0).sum(2)
        dbd = dbd.reshape(p, Ch0).sum(0)
        db2 = db2.reshape(p, C0).sum(0)
        dls = dls.reshape(p, C0).sum(0)
        dlb = dlb.reshape(p, C0).sum(0)
    else:
        db1, dbd, db2 = db1[0], dbd[0], db2[0]
        dls, dlb = dls[0], dlb[0]
    return dx, dw1, db1, dwd, dbd, dw2, db2, dls, dlb


@functools.lru_cache(maxsize=8)
def _leff_ad_factory(has_ln: bool, residual: bool, pallas_bwd: bool):
    """custom_vjp wrapper: Pallas forward; backward is the fused Pallas
    backward kernel on TPU (flash-style in-kernel recompute) or the
    rematerialized jnp VJP elsewhere."""

    @jax.custom_vjp
    def f(x, w1, b1, wd, bd, w2, b2, ln_s, ln_b):
        return fused_leff(x, w1, b1, wd, bd, w2, b2,
                          ln_s=ln_s if has_ln else None,
                          ln_b=ln_b if has_ln else None,
                          residual=residual)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        x, w1, b1, wd, bd, w2, b2, ln_s, ln_b = res
        if pallas_bwd:
            dx, dw1, db1, dwd, dbd, dw2, db2, dls, dlb = fused_leff_bwd(
                x, g, w1, b1, wd, bd, w2, ln_s, ln_b, has_ln=has_ln,
                residual=residual)
            zero = (lambda v, d: jnp.zeros(v.shape, v.dtype)
                    if d is None else d.astype(v.dtype))
            if not has_ln:
                dls = dlb = None
            return (dx.astype(x.dtype), dw1.astype(w1.dtype),
                    db1.astype(b1.dtype), dwd.astype(wd.dtype),
                    dbd.astype(bd.dtype), dw2.astype(w2.dtype),
                    db2.astype(b2.dtype), zero(ln_s, dls),
                    zero(ln_b, dlb))

        def ref(*a):
            return leff_reference(
                *a[:7], ln_s=a[7] if has_ln else None,
                ln_b=a[8] if has_ln else None, residual=residual)

        _, vjp = jax.vjp(ref, *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_leff_ad(x, w1, b1, wd, bd, w2, b2, ln_s=None, ln_b=None,
                  residual=False):
    has_ln = ln_s is not None
    if ln_s is None:
        C = x.shape[-1]
        ln_s = jnp.ones((C,), jnp.float32)
        ln_b = jnp.zeros((C,), jnp.float32)
    pallas_bwd = jax.default_backend() == "tpu"
    return _leff_ad_factory(has_ln, residual, pallas_bwd)(
        x, w1, b1, wd, bd, w2, b2, ln_s, ln_b)


@functools.partial(jax.jit, static_argnames=("residual", "interpret",
                                              "chunk_target", "conv_f32",
                                              "vmem_mb", "smallimg"))
def fused_leff(x, w1, b1, wd, bd, w2, b2, ln_s=None, ln_b=None, *,
               residual: bool = False, interpret: bool = False,
               chunk_target: int = 1, conv_f32: bool | None = None,
               vmem_mb: int = 0, smallimg: bool = True):
    """x: (B, H, W, C); returns (B, H, W, C). SAME-padded 3x3 depthwise.
    Optional ln_s/ln_b fold a preceding per-token LayerNorm in;
    residual=True returns x + LeFF(LN(x)) — the whole sub-block in one
    read and one write of x."""
    B, H, W, C = x.shape
    Ch = w1.shape[1]
    if conv_f32 is None:
        conv_f32 = _tap_dtype(x.dtype) == jnp.float32
    has_ln = ln_s is not None
    if ln_s is None:
        ln_s = jnp.ones((C,), jnp.float32)
        ln_b = jnp.zeros((C,), jnp.float32)

    # pixel packing for narrow-channel stages: view (B,H,W,C) as
    # (B,H,W/p,p*C) (a free reshape — W and C are HBM-adjacent) so every
    # DMA row is 128 lanes; weights expand to block-diagonal (kron) /
    # lane-tiled forms. See _make_kernel docstring for the measured 10-30x
    # narrow-DMA penalty this removes.
    p = 1
    if C < 128 and 128 % C == 0:
        cand = 128 // C
        if W % cand == 0 and W // cand >= 2:
            p = cand
    if p > 1:
        eye = jnp.eye(p, dtype=w1.dtype)
        w1 = jnp.kron(eye, w1)
        w2 = jnp.kron(eye.astype(w2.dtype), w2)
        b1 = jnp.tile(b1, p)
        b2 = jnp.tile(b2, p)
        wd = jnp.tile(wd, (1, 1, p))
        bd = jnp.tile(bd, p)
        ln_s = jnp.tile(ln_s, p)
        ln_b = jnp.tile(ln_b, p)
        x = x.reshape(B, H, W // p, p * C)
        W, C, Ch = W // p, p * C, p * Ch

    H0 = H
    if H % 8:  # odd sizes (tests, non-window models): pad rows, crop after
        Hp = (H + 7) // 8 * 8
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
        H = Hp

    bt, il = (_smallimg_plan(B, H, W, C, Ch, x.dtype.itemsize, 2,
                             12 if p > 1 else 4, p)
              if smallimg else (0, 1))
    if bt:
        kernel = _make_smallimg_kernel(bt, H0, H, W, C, Ch, has_ln,
                                       residual, x.dtype, p, ileave=il)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(B // bt,),
            in_specs=[
                pl.BlockSpec((bt, H, W, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                vmem, vmem,              # ln_s, ln_b
                vmem, vmem, vmem, vmem,  # w1, b1, wd, bd
                vmem, vmem,              # w2, b2
            ],
            out_specs=pl.BlockSpec((bt, H, W, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((il * (H + 2), W + 2, Ch), x.dtype)]
            + ([pltpu.VMEM((il * (H + 2), W, Ch), x.dtype)] * 2
               if p > 1 else []),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            interpret=interpret,
            compiler_params=(pltpu.CompilerParams(
                vmem_limit_bytes=50 * 2**20) if not interpret else None),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * H * W * Ch * (2 * C + 9),
                bytes_accessed=3 * B * H * W * C * x.dtype.itemsize,
                transcendentals=2 * B * H * W * Ch,
            ),
        )(x, ln_s, ln_b, w1, b1, wd, bd, w2, b2)
        if H != H0:
            out = out[:, :H0]
        if p > 1:
            out = out.reshape(B, H0, W * p, C // p)
        return out

    budget = (vmem_mb * 2**20) if vmem_mb else None
    Th = _pick_th(H, W, Ch, x.dtype.itemsize, budget=budget, C=C, p=p)
    nT = H // Th
    nB8 = H // 8
    kernel = _make_kernel(Th, H0, H, W, C, Ch, has_ln, residual, x.dtype,
                          conv_f32=conv_f32, chunk_target=chunk_target, p=p)
    k8 = Th // 8
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, Th, W, C), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            # 8-row neighbour blocks just above / below the tile (clamped
            # at the edges; the ring mask zeroes out-of-image halo rows)
            pl.BlockSpec((1, 8, W, C),
                         lambda b, t: (b, jnp.maximum(t * k8 - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, W, C),
                         lambda b, t: (b, jnp.minimum(t * k8 + k8, nB8 - 1),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            vmem, vmem,              # ln_s, ln_b
            vmem, vmem, vmem, vmem,  # w1, b1, wd, bd
            vmem, vmem,              # w2, b2
        ],
        out_specs=pl.BlockSpec((1, Th, W, C), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Th + 2, W + 2, Ch), x.dtype)]
        + ([pltpu.VMEM((Th + 2, W, Ch), x.dtype)] * 2 if p > 1 else []),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_mb * 2.5) * 2**20)
            if vmem_mb and not interpret else None),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * Ch * (2 * C + 9),
            bytes_accessed=3 * B * H * W * C * x.dtype.itemsize,
            transcendentals=2 * B * H * W * Ch,
        ),
    )(x, x, x, ln_s, ln_b, w1, b1, wd, bd, w2, b2)
    if H != H0:
        out = out[:, :H0]
    if p > 1:
        out = out.reshape(B, H0, W * p, C // p)
    return out
