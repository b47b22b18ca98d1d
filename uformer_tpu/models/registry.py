"""Named architecture registry — mirrors `get_arch`
(`/root/reference/utils/model_utils.py:56-82`).

Every named config the reference ships is constructible here with the same
hyperparameters. `img_size` corresponds to the reference's `--train_ps`
(it fixes construction-time win/shift adjustments only; the models accept
any NHWC input whose sides are multiples of 16 * win_size at call time).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from uformer_tpu.models.uformer import Uformer
from uformer_tpu.models.unet import UNet

_B_DEPTHS = (1, 2, 8, 8, 2, 8, 8, 2, 1)


def _uformer(img_size, embed_dim, depths, **kw):
    defaults: Dict[str, Any] = dict(
        img_size=img_size,
        embed_dim=embed_dim,
        depths=depths,
        win_size=kw.pop("win_size", 8),
        mlp_ratio=4.0,
        token_projection="linear",
        token_mlp="leff",
        modulator=True,
        shift_flag=True,
    )
    defaults.update(kw)
    return Uformer(**defaults)


ARCHS = {
    # reference model_utils.py:62-63
    "UNet": lambda opt: UNet(dim=opt.get("embed_dim", 32),
                             dtype=opt.get("dtype", jnp.float32)),
    # model_utils.py:64-65
    "Uformer": lambda opt: _uformer(
        opt.get("train_ps", 128), opt.get("embed_dim", 32), (2,) * 9,
        win_size=opt.get("win_size", 8), dd_in=opt.get("dd_in", 3), dtype=opt.get("dtype", jnp.float32),
        attn_backend=opt.get("attn_backend", "auto"),
        use_checkpoint=opt.get("use_checkpoint", False)),
    # model_utils.py:66-67
    "Uformer_T": lambda opt: _uformer(
        opt.get("train_ps", 128), 16, (2,) * 9,
        dd_in=opt.get("dd_in", 3), dtype=opt.get("dtype", jnp.float32),
        attn_backend=opt.get("attn_backend", "auto"),
        use_checkpoint=opt.get("use_checkpoint", False)),
    # model_utils.py:68-69
    "Uformer_S": lambda opt: _uformer(
        opt.get("train_ps", 128), 32, (2,) * 9,
        dd_in=opt.get("dd_in", 3), dtype=opt.get("dtype", jnp.float32),
        attn_backend=opt.get("attn_backend", "auto"),
        use_checkpoint=opt.get("use_checkpoint", False)),
    # model_utils.py:70-72
    "Uformer_S_noshift": lambda opt: _uformer(
        opt.get("train_ps", 128), 32, (2,) * 9, shift_flag=False,
        dd_in=opt.get("dd_in", 3), dtype=opt.get("dtype", jnp.float32),
        attn_backend=opt.get("attn_backend", "auto"),
        use_checkpoint=opt.get("use_checkpoint", False)),
    # model_utils.py:73-75 — fastleff routes the LeFF dwconv through the
    # Pallas kernel (the reference used the torch_dwconv CUDA extension)
    "Uformer_B_fastleff": lambda opt: _uformer(
        opt.get("train_ps", 128), 32, _B_DEPTHS, token_mlp="fastleff",
        dd_in=opt.get("dd_in", 3), dtype=opt.get("dtype", jnp.float32),
        attn_backend=opt.get("attn_backend", "auto"),
        use_checkpoint=opt.get("use_checkpoint", False)),
    # model_utils.py:76-78 — the flagship
    "Uformer_B": lambda opt: _uformer(
        opt.get("train_ps", 128), 32, _B_DEPTHS,
        dd_in=opt.get("dd_in", 3), dtype=opt.get("dtype", jnp.float32),
        attn_backend=opt.get("attn_backend", "auto"),
        use_checkpoint=opt.get("use_checkpoint", False)),
}


def get_arch(opt) -> Any:
    """Build a model from an options mapping or object.

    Accepts a dict or any object with `.arch` / `.embed_dim` / `.train_ps` /
    `.dd_in` attributes (the reference Options namespace shape).
    """
    if not isinstance(opt, dict):
        opt = {
            k: getattr(opt, k)
            for k in ("arch", "embed_dim", "train_ps", "dd_in", "dtype",
                      "attn_backend", "use_checkpoint")
            if hasattr(opt, k)
        }
    arch = opt.get("arch", "Uformer_B")
    if arch not in ARCHS:
        raise ValueError(f"unknown arch {arch!r}; available: {sorted(ARCHS)}")
    return ARCHS[arch](opt)
