"""The Uformer model: 4-level U-shaped LeWin transformer encoder-decoder.

TPU-native re-design of the reference top-level (`/root/reference/model.py:
1069-1328`): NHWC throughout, static shapes under jit, stochastic-depth
schedule identical to the reference (linear ramp over encoder blocks,
reversed for the decoder, constant for the bottleneck — model.py:1093-1095).

Channel plan (embed dim E): encoder E, 2E, 4E, 8E; bottleneck 16E; decoder
stages run at 16E/8E/4E/2E after concatenating the upsampled path with the
encoder skip (upsampled first, skip second — model.py:1288-1300).
Global residual `x + y` when dd_in == 3 (model.py:1305).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from uformer_tpu.models.layers import (
    BasicLayer,
    Downsample,
    InputProj,
    OutputProj,
    Upsample,
)


class Uformer(nn.Module):
    img_size: int = 256
    in_chans: int = 3
    dd_in: int = 3
    embed_dim: int = 32
    depths: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 4, 8, 16, 16, 8, 4, 2)
    win_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    token_projection: str = "linear"
    token_mlp: str = "leff"
    shift_flag: bool = True
    modulator: bool = False
    cross_modulator: bool = False
    use_checkpoint: bool = False
    attn_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def drop_path_schedule(self):
        """Reference model.py:1093-1095: per-block stochastic depth rates."""
        depths = list(self.depths)
        n_enc = sum(depths[:4])
        # Python floats, NOT np.float64: a strongly-typed numpy scalar
        # rate inside DropPath promotes the bf16 residual stream to f32
        # for every block with rate > 0 (found via per-instance kernel
        # profiling: the f32 stages' Pallas kernels ran 2-3x slower)
        enc_dpr = [float(v)
                   for v in np.linspace(0, self.drop_path_rate, n_enc)]
        conv_dpr = [float(self.drop_path_rate)] * depths[4]
        dec_dpr = enc_dpr[::-1]
        return enc_dpr, conv_dpr, dec_dpr

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        """x: (B, H, W, dd_in) NHWC, H and W multiples of 16 * win_size."""
        B, H, W, _ = x.shape
        E = self.embed_dim
        depths = list(self.depths)
        heads = list(self.num_heads)
        enc_dpr, conv_dpr, dec_dpr = self.drop_path_schedule()

        def stage(name, dim, depth, n_heads, dpr, reso, modulator=False,
                  cross_modulator=False):
            return BasicLayer(
                dim=dim, depth=depth, num_heads=n_heads, win_size=self.win_size,
                resolution=reso, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                drop_path=tuple(dpr), token_projection=self.token_projection,
                token_mlp=self.token_mlp, shift_flag=self.shift_flag,
                modulator=modulator, cross_modulator=cross_modulator,
                use_checkpoint=self.use_checkpoint,
                attn_backend=self.attn_backend, dtype=self.dtype, name=name,
            )

        y = InputProj(out_dim=E, dtype=self.dtype, name="input_proj")(
            x.astype(self.dtype))
        y = nn.Dropout(self.drop_rate)(y, deterministic=deterministic)

        # Encoder
        skips = []
        cum = np.cumsum([0] + depths)
        for k in range(4):
            y = stage(
                f"encoderlayer_{k}", E * 2**k, depths[k], heads[k],
                enc_dpr[cum[k]:cum[k + 1]], self.img_size // 2**k,
            )(y, mask, deterministic)
            skips.append(y)
            y = Downsample(E * 2 ** (k + 1), dtype=self.dtype,
                           name=f"dowsample_{k}")(y)

        # Bottleneck (named `conv` in the reference for checkpoint parity)
        y = stage("conv", E * 16, depths[4], heads[4], conv_dpr,
                  self.img_size // 16)(y, mask, deterministic)

        # Decoder
        dec_cum = np.cumsum([0] + depths[5:])
        for k in range(4):
            up = Upsample(E * 2 ** (3 - k), dtype=self.dtype,
                          name=f"upsample_{k}")(y)
            y = jnp.concatenate([up, skips[3 - k]], axis=-1)
            y = stage(
                f"decoderlayer_{k}", E * 2 ** (4 - k), depths[5 + k],
                heads[5 + k], dec_dpr[dec_cum[k]:dec_cum[k + 1]],
                self.img_size // 2 ** (3 - k),
                modulator=self.modulator, cross_modulator=self.cross_modulator,
            )(y, mask, deterministic)

        y = OutputProj(out_dim=self.in_chans, dtype=self.dtype,
                       name="output_proj")(y)
        y = y.astype(jnp.float32)
        if self.dd_in == 3:
            return x.astype(jnp.float32) + y
        return y
