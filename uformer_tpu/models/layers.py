"""Flax building blocks for the Uformer family (TPU-native, NHWC).

Functional re-design of the reference blocks (`/root/reference/model.py`):
every module takes/returns `(B, H, W, C)` NHWC activations — no
`(B, L, C)` token flattening with `sqrt(L)` recovery — and threads
explicit RNG through flax collections instead of global seeds.

Numerics pinned to the torch reference for checkpoint parity:
  * LayerNorm eps = 1e-5 (torch default).
  * GELU is the exact erf form (torch nn.GELU default), not tanh.
  * LeakyReLU negative_slope = 0.01 (torch default).
  * Attention logits/softmax in fp32 (see uformer_tpu.ops.attention).
Weight init mirrors `Uformer._init_weights` (model.py:1249-1256):
trunc-normal(0.02) for Dense, ones/zeros for LayerNorm; the modulator
embedding keeps torch's nn.Embedding default N(0,1).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from uformer_tpu.ops import (
    cyclic_shift,
    cyclic_unshift,
    depthwise_conv2d,
    gather_bias,
    input_mask_bias,
    shift_window_mask,
    window_attention,
    window_partition,
    window_reverse,
)

LN_EPS = 1e-5

# Stage-megakernel VMEM budgets (module-level so tests can force batch
# chunking): per-chunk image scratch cap, and the total for scratches +
# I/O windows together (the ~36 MB of in-kernel f32 temps and weights
# make up the rest of the 100 MB limit the kernel compiles under).
_MEGA_VMEM_CAP_MB = 24
_MEGA_VMEM_TOTAL_MB = 64
dense_init = nn.initializers.truncated_normal(stddev=0.02)


def gelu(x):
    """Exact (erf) GELU — torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.01)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath equivalent)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        # keep must stay a WEAK-typed Python float: a np.float64 rate
        # (e.g. from an np.linspace schedule) would promote the whole
        # residual stream bf16 -> f32 here — measured 2-3x slower Pallas
        # kernels for every block downstream (f32 DMA + HIGHEST matmuls)
        keep = 1.0 - float(self.rate)
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


def _norm(name: str, dtype=jnp.float32):
    """LayerNorm with torch eps; reductions are promoted to fp32 internally
    by flax regardless of `dtype`, so bf16 here only changes the I/O dtype
    (halves HBM traffic on the bf16 path)."""
    return nn.LayerNorm(epsilon=LN_EPS, name=name, dtype=dtype)


class Mlp(nn.Module):
    """Plain FFN: Linear-GELU-Drop-Linear-Drop (reference model.py:623-651)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, kernel_init=dense_init, dtype=self.dtype,
                     name="fc1")(x)
        x = gelu(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, kernel_init=dense_init, dtype=self.dtype,
                     name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class Eca1d(nn.Module):
    """Efficient channel attention over NHWC maps (reference eca_layer_1d,
    model.py:306-342): global-average channel descriptor -> k-tap 1-D conv
    across channels -> sigmoid gate."""

    k_size: int = 3

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) (reference operates on (B, L, C); same math)
        C = x.shape[-1]
        y = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))  # (B, C)
        w = self.param("conv", nn.initializers.lecun_normal(), (self.k_size, 1, 1))
        y = jax.lax.conv_general_dilated(
            y[:, :, None].astype(jnp.float32), w.astype(jnp.float32),
            window_strides=(1,), padding=[((self.k_size - 1) // 2,) * 2],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )[:, :, 0]
        gate = jax.nn.sigmoid(y).astype(x.dtype)
        return x * gate.reshape((-1,) + (1,) * (x.ndim - 2) + (C,))


class LeFF(nn.Module):
    """Locally-enhanced FFN (reference model.py:654-699): Linear-GELU ->
    3x3 depthwise conv -> GELU -> Linear, on the full (H, W) layout.

    The reference reshapes tokens via sqrt(hw); NHWC makes that a no-op.
    On TPU ('auto' backend) the whole pipeline runs as one fused Pallas
    kernel (uformer_tpu.ops.pallas.leff) so the 4x-wide hidden tensor
    never leaves VMEM; `fastleff` maps here with the kernel forced,
    mirroring the reference's torch_dwconv CUDA extension (model.py:14-58).
    Params are flat (linear1_kernel, ...) so both paths share them.
    """

    hidden_dim: int
    drop: float = 0.0
    use_eca: bool = False
    dw_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ln_params=None,
                 residual: bool = False):
        """residual=True returns x + LeFF(LN?(x)) — lets the block fold
        its second LN + residual into the fused kernel (one read/write of
        x instead of four XLA passes)."""
        from uformer_tpu.ops.attention import resolve_backend

        x0 = x
        dim = x.shape[-1]
        w1 = self.param("linear1_kernel", dense_init, (dim, self.hidden_dim))
        b1 = self.param("linear1_bias", nn.initializers.zeros,
                        (self.hidden_dim,))
        wd = self.param(
            "dwconv_kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (3, 3, self.hidden_dim),
        )
        bd = self.param("dwconv_bias", nn.initializers.zeros,
                        (self.hidden_dim,))
        w2 = self.param("linear2_kernel", dense_init, (self.hidden_dim, dim))
        b2 = self.param("linear2_bias", nn.initializers.zeros, (dim,))

        ln_s, ln_b = ln_params if ln_params is not None else (None, None)
        backend = resolve_backend(self.dw_backend)
        # the fused kernel can absorb the residual only if eca doesn't sit
        # between the LeFF output and the add
        k_res = residual and not self.use_eca
        # Active dropout always takes the jnp branch (the fused kernel has
        # no dropout); without this, drop>0 training would silently skip
        # dropout AND run the kernel in interpret mode on TPU.
        use_fused = backend == "pallas" and (self.drop == 0.0
                                             or deterministic)
        if use_fused and jax.default_backend() == "tpu":
            from uformer_tpu.ops.pallas.leff import fused_leff_ad

            out = fused_leff_ad(
                x, w1.astype(x.dtype), b1, wd.astype(x.dtype), bd,
                w2.astype(x.dtype), b2, ln_s=ln_s, ln_b=ln_b,
                residual=k_res)
        elif use_fused:
            from uformer_tpu.ops.pallas.leff import fused_leff

            out = fused_leff(
                x, w1.astype(x.dtype), b1, wd.astype(x.dtype), bd,
                w2.astype(x.dtype), b2, ln_s=ln_s, ln_b=ln_b,
                residual=k_res, interpret=True)
        else:
            k_res = False
            cd = self.dtype
            if ln_params is not None:
                xf = x.astype(jnp.float32)
                mu = xf.mean(-1, keepdims=True)
                var = xf.var(-1, keepdims=True)
                x = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)
                     * ln_s.astype(jnp.float32)
                     + ln_b.astype(jnp.float32)).astype(cd)
            y = (x.astype(cd) @ w1.astype(cd)) + b1.astype(cd)
            y = gelu(y)
            y = depthwise_conv2d(y, wd, bd, backend="jnp")
            y = gelu(y)
            y = nn.Dropout(self.drop)(y, deterministic=deterministic)
            out = (y @ w2.astype(cd)) + b2.astype(cd)
            out = nn.Dropout(self.drop)(out, deterministic=deterministic)
        if self.use_eca:
            out = Eca1d(name="eca")(out)
        if residual and not k_res:
            out = x0 + out
        return out



class SepConv2d(nn.Module):
    """Depthwise kxk + ReLU + pointwise 1x1 (reference model.py:344-378)."""

    out_dim: int
    kernel_size: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        pad = (self.kernel_size - self.stride) // 2
        w = self.param(
            "depthwise_kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.kernel_size, self.kernel_size, C),
        )
        b = self.param("depthwise_bias", nn.initializers.zeros, (C,))
        if self.stride == 1 and pad == self.kernel_size // 2:
            x = depthwise_conv2d(x, w, b)
        else:
            kernel = w.reshape(self.kernel_size, self.kernel_size, 1, C)
            x = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C,
            ) + b.astype(x.dtype)
        x = jax.nn.relu(x)
        x = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="pointwise")(x)
        return x


class LinearProjection(nn.Module):
    """q from Dense(dim->inner), kv from Dense(dim->2*inner); optional
    external kv source for cross-attention (reference model.py:421-447)."""

    num_heads: int
    head_dim: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_kv=None):
        # x: (Bw, N, C)
        Bw, N, C = x.shape
        inner = self.num_heads * self.head_dim
        if attn_kv is None:
            attn_kv = x
        elif attn_kv.ndim == 2:  # shared (N_kv, C) table broadcast over batch
            attn_kv = jnp.broadcast_to(attn_kv[None], (Bw,) + attn_kv.shape)
        N_kv = attn_kv.shape[1]
        q = nn.Dense(inner, use_bias=self.use_bias, kernel_init=dense_init,
                     dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(2 * inner, use_bias=self.use_bias, kernel_init=dense_init,
                      dtype=self.dtype, name="to_kv")(attn_kv)
        q = q.reshape(Bw, N, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        kv = kv.reshape(Bw, N_kv, 2, self.num_heads, self.head_dim)
        k = kv[:, :, 0].transpose(0, 2, 1, 3)
        v = kv[:, :, 1].transpose(0, 2, 1, 3)
        return q, k, v


class ConvProjection(nn.Module):
    """q/k/v via separable convs on the 2-D window layout
    (reference model.py:381-418); selected by token_projection='conv'."""

    num_heads: int
    head_dim: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_kv=None):
        Bw, N, C = x.shape
        side = int(math.isqrt(N))
        inner = self.num_heads * self.head_dim
        if attn_kv is None:
            attn_kv = x
        xs = x.reshape(Bw, side, side, C)
        kvs = attn_kv.reshape(Bw, side, side, C)
        q = SepConv2d(inner, self.kernel_size, dtype=self.dtype, name="to_q")(xs)
        k = SepConv2d(inner, self.kernel_size, dtype=self.dtype, name="to_k")(kvs)
        v = SepConv2d(inner, self.kernel_size, dtype=self.dtype, name="to_v")(kvs)

        def heads(t):
            return t.reshape(Bw, N, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

        return heads(q), heads(k), heads(v)


class _LNParams(nn.Module):
    """Parameter holder matching nn.LayerNorm's tree (scale/bias) without
    running it — for kernels that fold the LayerNorm in."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


class _DenseParams(nn.Module):
    """Parameter holder producing the same tree as nn.Dense without running
    its matmul — used by fused-kernel paths that consume raw weights."""

    features_in: int
    features_out: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", dense_init,
                       (self.features_in, self.features_out))
        b = self.param("bias", nn.initializers.zeros,
                       (self.features_out,)) if self.use_bias else None
        return k, b


class _LinearQKVParams(nn.Module):
    """Parameter tree identical to LinearProjection (to_q/to_kv Dense)."""

    dim: int
    inner: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        wq, bq = _DenseParams(self.dim, self.inner, self.use_bias,
                              name="to_q")()
        wkv, bkv = _DenseParams(self.dim, 2 * self.inner, self.use_bias,
                                name="to_kv")()
        return wq, bq, wkv, bkv


class _AttnParams(nn.Module):
    """Parameter tree identical to WindowAttention's (table + linear qkv +
    proj) without running it — for the whole-stage megakernel."""

    dim: int
    num_heads: int
    win: int = 8
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * self.win - 1) * (2 * self.win - 1), self.num_heads),
        )
        wq, bq, wkv, bkv = _LinearQKVParams(self.dim, self.dim,
                                            self.qkv_bias, name="qkv")()
        wo, bo = _DenseParams(self.dim, self.dim, True, name="proj")()
        return table, wq, bq, wkv, bkv, wo, bo


class _LeFFParams(nn.Module):
    """Parameter tree identical to LeFF's flat params without running it."""

    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self):
        w1 = self.param("linear1_kernel", dense_init,
                        (self.dim, self.hidden_dim))
        b1 = self.param("linear1_bias", nn.initializers.zeros,
                        (self.hidden_dim,))
        wd = self.param(
            "dwconv_kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (3, 3, self.hidden_dim),
        )
        bd = self.param("dwconv_bias", nn.initializers.zeros,
                        (self.hidden_dim,))
        w2 = self.param("linear2_kernel", dense_init,
                        (self.hidden_dim, self.dim))
        b2 = self.param("linear2_bias", nn.initializers.zeros, (self.dim,))
        return w1, b1, wd, bd, w2, b2


class _LeWinParams(nn.Module):
    """Full LeWin-block parameter tree (norm1/attn/modulator/norm2/mlp),
    names and initializers identical to LeWinBlock's, returned as raw
    arrays for the stage megakernel."""

    dim: int
    num_heads: int
    hidden_dim: int
    qkv_bias: bool = True
    modulator: bool = False
    win: int = 8

    @nn.compact
    def __call__(self, dtype):
        d = {}
        d["ln1_s"], d["ln1_b"] = _LNParams(self.dim, name="norm1")()
        table, wq, bq, wkv, bkv, wo, bo = _AttnParams(
            self.dim, self.num_heads, self.win, self.qkv_bias,
            name="attn")()
        d["bias"] = gather_bias(table.astype(jnp.float32), self.win,
                                self.win)
        d["wq"] = wq.astype(dtype)
        d["bq"] = bq if bq is not None else jnp.zeros((self.dim,),
                                                      jnp.float32)
        d["wk"] = wkv[:, :self.dim].astype(dtype)
        d["wv"] = wkv[:, self.dim:].astype(dtype)
        kvb = bkv if bkv is not None else jnp.zeros((2 * self.dim,),
                                                    jnp.float32)
        d["bk"], d["bv"] = kvb[:self.dim], kvb[self.dim:]
        d["wo"] = wo.astype(dtype)
        d["bo"] = bo
        if self.modulator:
            d["mod"] = self.param(
                "modulator", nn.initializers.normal(stddev=1.0),
                (self.win * self.win, self.dim)).astype(dtype)
        else:
            d["mod"] = jnp.zeros((self.win * self.win, self.dim), dtype)
        d["ln2_s"], d["ln2_b"] = _LNParams(self.dim, name="norm2")()
        w1, b1, wd, bd, w2, b2 = _LeFFParams(self.dim, self.hidden_dim,
                                             name="mlp")()
        d["w1"], d["b1"] = w1.astype(dtype), b1
        d["wd"], d["bd"] = wd.astype(dtype), bd
        d["w2"], d["b2"] = w2.astype(dtype), b2
        return d


class WindowAttention(nn.Module):
    """Window MHSA with relative position bias (reference model.py:452-546).

    Operates on pre-partitioned windows `(Bw, N, C)`; the relative-position
    bias table and index construction match the reference exactly so torch
    checkpoints convert losslessly. On TPU with linear projection and no
    user mask, the whole modulator+qkv+attention+proj pipeline runs as one
    block-fused Pallas kernel.
    """

    dim: int
    win_size: Tuple[int, int]
    num_heads: int
    token_projection: str = "linear"
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_kv=None, mask=None, deterministic: bool = True,
                 geometry=None, modulator=None, ln_params=None,
                 image_mode: bool = False, image_residual: bool = True):
        """geometry: optional static (H, W, shift) enabling the fused Pallas
        kernels with the SW-MSA shift mask computed inline (mask must then
        be None — user input-masks take the unfused path). `modulator` is
        the learned per-window embedding added to the attention input
        (reference model.py:966-969), folded into the fused kernel.

        image_mode: x is the raw (B, H, W, C) block input; the whole
        LN -> shift -> partition -> attention -> reverse -> unshift ->
        [residual] sub-block runs as ONE image-layout Pallas kernel
        (ops.pallas.attention_image). image_residual=False returns just
        the attention branch in image layout (training blocks with active
        DropPath scale the branch outside). Caller guarantees win == 8
        and a lane-aligned C."""
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5
        wh, ww = self.win_size

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * wh - 1) * (2 * ww - 1), self.num_heads),
        )
        bias = gather_bias(table.astype(jnp.float32), wh, ww)  # (nH, N, N)

        if image_mode:
            from uformer_tpu.ops.pallas.attention_image import (
                fused_attention_image_ad)

            H, W, shift = geometry
            wq, bq, wkv, bkv = _LinearQKVParams(
                self.dim, self.num_heads * head_dim, self.qkv_bias,
                name="qkv")()
            wo, bo = _DenseParams(self.dim, self.dim, True, name="proj")()
            zeros = lambda n: jnp.zeros((n,), x.dtype)  # noqa: E731
            ln_s, ln_b = (ln_params if ln_params is not None
                          else (None, None))
            return fused_attention_image_ad(
                x, modulator, ln_s, ln_b,
                wq.astype(x.dtype), bq if bq is not None else zeros(self.dim),
                wkv.astype(x.dtype),
                bkv if bkv is not None else zeros(2 * self.dim),
                wo.astype(x.dtype), bo,
                bias, win=wh, shift=shift, scale=float(scale),
                num_heads=self.num_heads, has_ln=ln_params is not None,
                residual=image_residual,
                interpret=jax.default_backend() != "tpu")

        Bw, N, C = x.shape

        from uformer_tpu.ops.attention import resolve_backend

        backend = resolve_backend(self.backend)
        fused_block_ok = (
            backend == "pallas" and geometry is not None and mask is None
            and attn_kv is None and self.token_projection == "linear"
            and not (self.attn_drop > 0.0 and not deterministic))
        if fused_block_ok:
            from uformer_tpu.ops.pallas.attention_block import (
                fused_attention_block_ad)

            H, W, shift = geometry
            wq, bq, wkv, bkv = _LinearQKVParams(
                self.dim, self.num_heads * head_dim, self.qkv_bias,
                name="qkv")()
            wo, bo = _DenseParams(self.dim, self.dim, True, name="proj")()
            zeros = lambda n: jnp.zeros((n,), x.dtype)  # noqa: E731
            ln_s, ln_b = (ln_params if ln_params is not None
                          else (None, None))
            out = fused_attention_block_ad(
                x, modulator, ln_s, ln_b,
                wq.astype(x.dtype), bq if bq is not None else zeros(self.dim),
                wkv.astype(x.dtype),
                bkv if bkv is not None else zeros(2 * self.dim),
                wo.astype(x.dtype), bo,
                bias, win=wh, shift=shift, H=H, W=W, scale=float(scale),
                num_heads=self.num_heads, has_ln=ln_params is not None,
                interpret=jax.default_backend() != "tpu")
            return nn.Dropout(self.proj_drop)(out,
                                              deterministic=deterministic)

        if geometry is not None and mask is None:
            # Defensive: the caller deferred the SW-MSA shift mask to the
            # fused kernel but we declined the fused path — rebuild the
            # mask from geometry so shifted windows never silently attend
            # across window boundaries.
            _, _, g_shift = geometry
            if g_shift > 0:
                gH, gW, _ = geometry
                mask = jnp.asarray(shift_window_mask(gH, gW, wh, g_shift))
        if ln_params is not None:
            # block-level LN was deferred to us but the fused path wasn't
            # taken — apply it here
            sc, bi = ln_params
            xf = x.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = xf.var(-1, keepdims=True)
            x = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)
                 * sc.astype(jnp.float32)
                 + bi.astype(jnp.float32)).astype(self.dtype)
        if modulator is not None:
            x = x + modulator.astype(x.dtype)
        if self.token_projection == "conv":
            proj_cls = ConvProjection
        elif self.token_projection == "linear":
            proj_cls = LinearProjection
        else:
            raise ValueError(f"unknown token_projection {self.token_projection}")
        q, k, v = proj_cls(
            num_heads=self.num_heads, head_dim=head_dim, use_bias=self.qkv_bias,
            dtype=self.dtype, name="qkv",
        )(x, attn_kv)

        n_kv = k.shape[2]
        if n_kv != N:
            # kv longer than win**2 (cross-attention): tile bias/mask along kv
            # (the reference's `ratio` repeat, model.py:503-513).
            ratio = n_kv // N
            bias = jnp.repeat(bias, ratio, axis=-1)
            if mask is not None:
                mask = jnp.repeat(mask, ratio, axis=-1)

        if self.attn_drop > 0.0 and not deterministic:
            # Dropout on attention probabilities requires the unfused path.
            out = self._attn_with_dropout(q, k, v, bias, mask, scale)
        else:
            out = window_attention(q, k, v, bias, mask, scale=scale,
                                   backend="jnp")
        out = nn.Dense(self.dim, kernel_init=dense_init, dtype=self.dtype,
                       name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out

    def _attn_with_dropout(self, q, k, v, bias, mask, scale):
        Bw, nH, N, D = q.shape
        attn = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32) * scale,
                          k.astype(jnp.float32))
        attn = attn + bias[None]
        if mask is not None:
            if mask.shape[0] == Bw:
                attn = attn + mask[:, None].astype(jnp.float32)
            else:
                nW = mask.shape[0]
                attn = attn.reshape(Bw // nW, nW, nH, N, -1) + \
                    mask[None, :, None].astype(jnp.float32)
                attn = attn.reshape(Bw, nH, N, -1)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=False)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(jnp.float32))
        return out.transpose(0, 2, 1, 3).reshape(Bw, N, nH * D).astype(q.dtype)


class Attention(nn.Module):
    """Plain MHSA without relative bias — only used by the cross_modulator
    path (reference model.py:549-618)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_kv=None, deterministic: bool = True):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5
        q, k, v = LinearProjection(
            num_heads=self.num_heads, head_dim=head_dim, use_bias=self.qkv_bias,
            dtype=self.dtype, name="qkv",
        )(x, attn_kv)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32) * scale,
                          k.astype(jnp.float32))
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(jnp.float32))
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C).astype(x.dtype)
        out = nn.Dense(self.dim, kernel_init=dense_init, dtype=self.dtype,
                       name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class LeWinBlock(nn.Module):
    """LeWin transformer block (reference model.py:850-1008).

    NHWC in/out. Pipeline: [cross-modulator] -> LN -> cyclic shift ->
    window partition -> [+ modulator] -> window attention (+ static shift
    mask, + optional input-mask bias) -> reverse -> residual/DropPath ->
    LN -> LeFF/MLP -> residual.
    """

    dim: int
    num_heads: int
    win_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    token_projection: str = "linear"
    token_mlp: str = "leff"
    modulator: bool = False
    cross_modulator: bool = False
    attn_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        B, H, W, C = x.shape
        win, shift = self.win_size, self.shift_size
        assert 0 <= shift < win

        from uformer_tpu.ops.attention import resolve_backend

        # Mirror WindowAttention.fused_block_ok exactly: if the attention
        # layer would decline the fused kernel (conv projection, active
        # attention dropout), the shift mask must be built HERE — the
        # unfused path cannot compute it inline.
        fused = (resolve_backend(self.attn_backend) == "pallas"
                 and mask is None
                 and self.token_projection == "linear"
                 and not (self.attn_drop > 0.0 and not deterministic))

        # --- attention mask (static for given geometry; the fused kernel
        # computes the shift mask inline instead) ---
        attn_mask = None
        geometry = (H, W, shift) if fused else None
        if not fused:
            if mask is not None:
                attn_mask = input_mask_bias(mask, H, W, win)  # (B*nW, N, N)
            if shift > 0:
                smask = jnp.asarray(shift_window_mask(H, W, win, shift))
                if attn_mask is not None:
                    nW = smask.shape[0]
                    attn_mask = attn_mask.reshape(
                        B, nW, win * win, win * win) + smask[None]
                    attn_mask = attn_mask.reshape(
                        B * nW, win * win, win * win)
                else:
                    attn_mask = smask

        if self.cross_modulator:
            cross_mod = self.param(
                "cross_modulator", nn.initializers.normal(stddev=1.0),
                (win * win, self.dim),
            )
            shortcut = x
            xt = x.reshape(B, H * W, C)
            # Reference quirk (model.py:947-948): norm_cross(x) is computed
            # but the *unnormalized* x feeds cross_attn. Replicated for
            # checkpoint parity; norm_cross params still exist.
            _ = _norm("norm_cross", self.dtype)(xt)
            xc = Attention(
                dim=self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, attn_drop=self.attn_drop,
                proj_drop=self.drop, dtype=self.dtype, name="cross_attn",
            )(xt, cross_mod.astype(self.dtype), deterministic=deterministic)
            x = shortcut + xc.reshape(B, H, W, C)

        mod = None
        if self.modulator:
            mod = self.param(
                "modulator", nn.initializers.normal(stddev=1.0),
                (win * win, self.dim),
            )

        # Image-layout fused sub-block (eval path): LN1 + cyclic shift +
        # partition + attention + reverse + unshift + residual in ONE
        # kernel — the XLA glue between them never touches HBM. Lane
        # alignment (C % 128) keeps every in-kernel reshape layout-free;
        # narrow stages (128 % C == 0: C=32/64) have a pixel-packed
        # variant (kron projections + perm-order core) that reads the
        # image as full-lane (H, W/p, 128) rows — default ON (hardware-
        # validated on v5e: 11.4 -> 13.1 MP/s on the Uformer_B forward);
        # opt out with UFORMER_TPU_PACKED_ATTN=0 to fall back to the
        # windowed kernel.
        import os as _os
        narrow_ok = (128 % self.dim == 0 and self.dim >= 32
                     and (shift % (128 // self.dim) == 0)
                     and _os.environ.get("UFORMER_TPU_PACKED_ATTN",
                                         "1") != "0")
        # Training (deterministic=False) may use the image kernel too when
        # proj- AND attention-dropout are off (the reference recipe): the
        # forward is glue-free and the backward re-windows in XLA + runs
        # the fused windowed Pallas bwd (attention_image._ad_factory).
        # image_mode applies no attention-probability dropout, so
        # attn_drop > 0 must fall back to the unfused path. Narrow-C
        # stages run it too: the packed backward recomputes the folded
        # LN in packed lanes and emits dls/dlb (attention_block.py
        # _make_packed_bwd_kernel).
        train_image_ok = (self.drop == 0.0 and self.attn_drop == 0.0
                          and (self.dim % 128 == 0 or narrow_ok))
        use_image = (fused and win == 8
                     and (deterministic or train_image_ok)
                     and (self.dim % 128 == 0 or narrow_ok))
        if use_image:
            ln1 = _LNParams(self.dim, name="norm1")()
            # active DropPath scales the branch, so the residual stays
            # outside the kernel for those blocks
            img_res = deterministic or self.drop_path == 0.0
            y = WindowAttention(
                dim=self.dim, win_size=(win, win), num_heads=self.num_heads,
                token_projection=self.token_projection,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                attn_drop=self.attn_drop, proj_drop=self.drop,
                backend=self.attn_backend, dtype=self.dtype, name="attn",
            )(x, deterministic=deterministic, geometry=(H, W, shift),
              modulator=mod, ln_params=ln1, image_mode=True,
              image_residual=img_res)
            if img_res:
                x = y
            else:
                x = x + DropPath(self.drop_path, name="drop_path1")(
                    y, deterministic=deterministic)
        else:
            shortcut = x
            # LN folding into the windowed kernel measured slower than
            # XLA's standalone LN (lane-padded fp32 in-kernel LN + smaller
            # tiles outweigh the saved pass) — disabled; the kernel keeps
            # the capability (tested).
            defer_ln1 = False and fused and self.token_projection == "linear" \
                and not (self.attn_drop > 0.0 and not deterministic)
            if defer_ln1:
                ln1 = _LNParams(self.dim, name="norm1")()
            else:
                ln1 = None
                x = _norm("norm1", self.dtype)(x)
            # packed-view glue: when the narrow-C packed kernels are
            # active, run the roll + partition transposes on the
            # (W/p, p*C) full-lane view (bytes-identical outputs)
            pk = ((128 // self.dim)
                  if narrow_ok and fused and win % (128 // self.dim) == 0
                  else 0)
            if pk > 1:
                from uformer_tpu.ops.window import (
                    cyclic_shift_packed,
                    window_partition_packed,
                )

                x = cyclic_shift_packed(x, shift, pk)
                x_windows = window_partition_packed(x, win, pk)
            else:
                x = cyclic_shift(x, shift)
                x_windows = window_partition(x, win)  # (B*nW, N, C)

            attn_out = WindowAttention(
                dim=self.dim, win_size=(win, win), num_heads=self.num_heads,
                token_projection=self.token_projection,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                attn_drop=self.attn_drop, proj_drop=self.drop,
                backend=self.attn_backend, dtype=self.dtype, name="attn",
            )(x_windows, mask=attn_mask, deterministic=deterministic,
              geometry=geometry, modulator=mod, ln_params=ln1)

            if pk > 1:
                from uformer_tpu.ops.window import (
                    cyclic_unshift_packed,
                    window_reverse_packed,
                )

                x = window_reverse_packed(attn_out, win, H, W, pk)
                x = cyclic_unshift_packed(x, shift, pk)
            else:
                x = window_reverse(attn_out, win, H, W)
                x = cyclic_unshift(x, shift)

            x = shortcut + DropPath(self.drop_path, name="drop_path1")(
                x, deterministic=deterministic)

        # The whole LN2 -> LeFF [-> residual] sub-block folds into the
        # fused kernel (x read/written once instead of ~4 XLA passes) at
        # eval AND in training when dropout is off — the fused Pallas
        # backward (fused_leff_bwd) handles the gradient. With active
        # DropPath the residual stays outside (DropPath scales the
        # branch); active dropout falls back to the unfused path below.
        fold_mlp = (self.token_mlp in ("leff", "fastleff")
                    and (deterministic or self.drop == 0.0))
        if fold_mlp:
            ln2 = _LNParams(self.dim, name="norm2")()
            k_res = deterministic or self.drop_path == 0.0
            y = LeFF(
                hidden_dim=int(self.dim * self.mlp_ratio), drop=self.drop,
                dw_backend=("pallas" if self.token_mlp == "fastleff"
                            else "auto"),
                dtype=self.dtype, name="mlp")(
                    x, deterministic=deterministic, ln_params=ln2,
                    residual=k_res)
            if k_res:
                return y
            return x + DropPath(self.drop_path, name="drop_path2")(
                y, deterministic=deterministic)

        y = _norm("norm2", self.dtype)(x)
        if self.token_mlp in ("ffn", "mlp"):
            y = Mlp(hidden_dim=int(self.dim * self.mlp_ratio), drop=self.drop,
                    dtype=self.dtype, name="mlp")(y, deterministic=deterministic)
        elif self.token_mlp == "leff":
            y = LeFF(hidden_dim=int(self.dim * self.mlp_ratio), drop=self.drop,
                     dtype=self.dtype, name="mlp")(
                         y, deterministic=deterministic)
        elif self.token_mlp == "fastleff":
            y = LeFF(hidden_dim=int(self.dim * self.mlp_ratio), drop=self.drop,
                     dw_backend="pallas", dtype=self.dtype, name="mlp")(
                         y, deterministic=deterministic)
        else:
            raise ValueError(f"unknown token_mlp {self.token_mlp}")
        x = x + DropPath(self.drop_path, name="drop_path2")(
            y, deterministic=deterministic)
        return x


class BasicLayer(nn.Module):
    """Stage: stack of `depth` LeWin blocks with alternating shift
    (reference BasicUformerLayer, model.py:1013-1066). The reference's
    win/shift auto-adjustment for small resolutions (model.py:863-865) is
    applied from the *configured* stage resolution, matching torch
    construction-time semantics.
    """

    dim: int
    depth: int
    num_heads: int
    win_size: int = 8
    resolution: Optional[int] = None  # configured (img_size-derived) resolution
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = (0.0,)
    token_projection: str = "linear"
    token_mlp: str = "leff"
    shift_flag: bool = True
    modulator: bool = False
    cross_modulator: bool = False
    use_checkpoint: bool = False
    attn_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        win = self.win_size
        reso = self.resolution if self.resolution is not None else min(x.shape[1:3])

        # Whole-stage megakernel (eval): all `depth` blocks in ONE Pallas
        # kernel with the image VMEM-resident across the stage. Gated to
        # the small-resolution lane-aligned stages where per-kernel
        # overhead dominates; the param tree is identical to the
        # per-block path so checkpoints are unaffected.
        from uformer_tpu.ops.attention import resolve_backend

        B, H, W, C = x.shape
        itemsize = 2 if self.dtype == jnp.bfloat16 else 4
        # VMEM budget for the stage megakernel: the (bc, H, W, C) image
        # scratch, the (H+2, W+2, Ch) LeFF hidden, the per-head combined
        # bias+mask scratch, and the double-buffered I/O windows must be
        # co-resident. When the full batch doesn't fit (dec2 at 256²
        # inference: 8*128²*128 bf16 = 33.5 MB), run the megakernel over
        # the largest batch CHUNK that does — weights re-DMA once per
        # chunk (~µs) while the stage keeps its one-read-one-write HBM
        # profile.
        cap = _MEGA_VMEM_CAP_MB * 2**20
        Twin = (H // 8) * (W // 8) if H % 8 == 0 and W % 8 == 0 else 0
        gpar = 2 if Twin % 2 == 0 else 1
        sm_it = 2 if self.dtype == jnp.bfloat16 else 4
        # il: the stage kernel's 2-image MXU/VPU interleave (stage.py
        # fused_stage auto rule, incl. its B % 2 parity) — doubles the
        # hidden scratch and the double-buffered I/O windows. Odd B has
        # no even chunk, so il = 1 keeps bc = B legal.
        il = 2 if (B % 2 == 0 and C <= 256 and Twin == 64) else 1
        fixed = (self.num_heads * Twin * 4096 * gpar * sm_it   # smask
                 + il * (H + 2) * (W + 2) * int(C * self.mlp_ratio)
                 * itemsize
                 + 4 * il * H * W * C * itemsize)  # in+out, 2-level
        # T = 256 windows (128² stages): the WHOLE-IMAGE attention
        # temporaries used to exceed Mosaic's register budget (~84 MB of
        # spill slots, measured) — stage.py chunks the inner loops
        # (nck/nls) to cap them. Hardware-A/B'd 2026-08-20: default ON —
        # headline 14.24 vs 13.93 MP/s, dec2 stage 3.72 vs 4.32 ms
        # per-block, no Mosaic spill warnings
        # (bench_artifacts/ab/q_infer_t256.txt). Opt out with
        # UFORMER_TPU_MEGA_T256=0.
        import os as _os
        tmax = (256 if _os.environ.get("UFORMER_TPU_MEGA_T256", "1")
                == "1" else 64)
        bc = 0
        if (0 < Twin <= tmax and H * W * C * itemsize <= cap
                and fixed + H * W * C * itemsize <= _MEGA_VMEM_TOTAL_MB
                * 2**20):
            bc = B
            # bc must divide B and (above 1) match the interleave pair
            # granularity; bc == 1 stays legal — fused_stage then runs
            # ileave=1, which needs strictly less VMEM than accounted
            while bc > 1 and (
                    B % bc or bc % il or bc * H * W * C * itemsize > cap
                    or fixed + bc * H * W * C * itemsize
                    > _MEGA_VMEM_TOTAL_MB * 2**20):
                bc -= 1
        mega = (deterministic and mask is None
                and resolve_backend(self.attn_backend) == "pallas"
                and self.token_projection == "linear"
                and self.token_mlp in ("leff", "fastleff")
                and not self.cross_modulator
                and win == 8 and reso >= win
                and C % 128 == 0 and H % 8 == 0 and W % 8 == 0
                and bc > 0)
        if mega:
            from uformer_tpu.ops.pallas.stage import fused_stage_ad

            dt = self.dtype
            blocks = [
                _LeWinParams(
                    dim=C, num_heads=self.num_heads,
                    hidden_dim=int(C * self.mlp_ratio),
                    qkv_bias=self.qkv_bias, modulator=self.modulator,
                    win=win, name=f"blocks_{i}")(dt)
                for i in range(self.depth)
            ]
            p = {k: jnp.stack([b[k] for b in blocks]) for k in blocks[0]}
            head_dim = C // self.num_heads
            scale = self.qk_scale or head_dim ** -0.5
            kw = dict(scale=float(scale), num_heads=self.num_heads,
                      use_shift=self.shift_flag and reso > win,
                      has_mod=self.modulator,
                      interpret=jax.default_backend() != "tpu")
            if bc == B:
                return fused_stage_ad(x.astype(dt), p, **kw)
            xc = x.astype(dt)
            return jnp.concatenate(
                [fused_stage_ad(xc[i:i + bc], p, **kw)
                 for i in range(0, B, bc)], axis=0)

        block_cls = LeWinBlock
        if self.use_checkpoint:
            block_cls = nn.checkpoint(
                LeWinBlock, static_argnums=(3,),
                policy=jax.checkpoint_policies.nothing_saveable)
        for i in range(self.depth):
            shift = 0 if (not self.shift_flag or i % 2 == 0) else win // 2
            if reso <= win:
                shift = 0
                win_i = min(reso, win)
            else:
                win_i = win
            blk = block_cls(
                dim=self.dim, num_heads=self.num_heads, win_size=win_i,
                shift_size=shift, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale, drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=self.drop_path[i] if i < len(self.drop_path) else self.drop_path[-1],
                token_projection=self.token_projection, token_mlp=self.token_mlp,
                modulator=self.modulator, cross_modulator=self.cross_modulator,
                attn_backend=self.attn_backend, dtype=self.dtype,
                name=f"blocks_{i}",
            )
            x = blk(x, mask, deterministic)
        return x


class InputProj(nn.Module):
    """3x3 conv + LeakyReLU (reference model.py:781-810); NHWC out."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_dim, (3, 3), padding="SAME", dtype=self.dtype,
                    name="proj")(x)
        return leaky_relu(x)


class OutputProj(nn.Module):
    """3x3 conv to image channels (reference model.py:813-846)."""

    out_dim: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_dim, (3, 3), padding="SAME", dtype=self.dtype,
                       name="proj")(x)


class Downsample(nn.Module):
    """4x4 stride-2 conv doubling channels (reference model.py:730-753)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_dim, (4, 4), strides=(2, 2),
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv")(x)


class Upsample(nn.Module):
    """2x2 stride-2 transposed conv halving channels (reference
    model.py:756-778). Uses `transpose_kernel=True` so torch
    ConvTranspose2d weights map over directly (IOHW -> HWIO transpose
    only)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.out_dim, (2, 2), strides=(2, 2), padding="VALID",
            transpose_kernel=True, dtype=self.dtype, name="deconv")(x)
