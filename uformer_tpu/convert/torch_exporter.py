"""JAX pytree -> PyTorch `.pth` checkpoint exporter (inverse of
`torch_converter`): lets models trained in this framework be loaded by
the reference torch codebase (same key naming and layouts, same
`{'epoch','state_dict','optimizer'}` container as
`/root/reference/train/train_denoise.py:207-210`).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def _np(x):
    return np.asarray(x)


def _linear(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _conv(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _conv_transpose(sd, prefix, p):
    # flax (transpose_kernel=True) kernel (kh, kw, O, I) -> torch (I, O, kh, kw)
    sd[f"{prefix}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _layernorm(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])


def _leff(sd, prefix, p):
    sd[f"{prefix}.linear1.0.weight"] = _np(p["linear1_kernel"]).T
    sd[f"{prefix}.linear1.0.bias"] = _np(p["linear1_bias"])
    sd[f"{prefix}.linear2.0.weight"] = _np(p["linear2_kernel"]).T
    sd[f"{prefix}.linear2.0.bias"] = _np(p["linear2_bias"])
    dw = _np(p["dwconv_kernel"]).transpose(2, 0, 1)[:, None]  # (C,1,3,3)
    sd[f"{prefix}.dwconv.0.weight"] = dw
    sd[f"{prefix}.dwconv.0.bias"] = _np(p["dwconv_bias"])
    if "eca" in p:
        # (k, 1, 1) HIO -> torch Conv1d weight (1, 1, k); inverse of
        # torch_converter._leff
        sd[f"{prefix}.eca.conv.weight"] = _np(
            p["eca"]["conv"]).transpose(2, 1, 0)


def _mlp(sd, prefix, p):
    _linear(sd, f"{prefix}.fc1", p["fc1"])
    _linear(sd, f"{prefix}.fc2", p["fc2"])


def _sepconv(sd, prefix, p):
    dw = _np(p["depthwise_kernel"]).transpose(2, 0, 1)[:, None]
    sd[f"{prefix}.depthwise.weight"] = dw
    if "depthwise_bias" in p:
        sd[f"{prefix}.depthwise.bias"] = _np(p["depthwise_bias"])
    _conv(sd, f"{prefix}.pointwise", p["pointwise"])


def _qkv(sd, prefix, p):
    if "to_kv" in p:
        _linear(sd, f"{prefix}.to_q", p["to_q"])
        _linear(sd, f"{prefix}.to_kv", p["to_kv"])
    else:
        _sepconv(sd, f"{prefix}.to_q", p["to_q"])
        _sepconv(sd, f"{prefix}.to_k", p["to_k"])
        _sepconv(sd, f"{prefix}.to_v", p["to_v"])


def _block(sd, prefix, p):
    _layernorm(sd, f"{prefix}.norm1", p["norm1"])
    _layernorm(sd, f"{prefix}.norm2", p["norm2"])
    table = _np(p["attn"]["relative_position_bias_table"])
    sd[f"{prefix}.attn.relative_position_bias_table"] = table
    # torch registers the (deterministic) index as a state_dict buffer
    from uformer_tpu.ops.relpos import relative_position_index

    win = int(round((table.shape[0] ** 0.5 + 1) / 2))
    sd[f"{prefix}.attn.relative_position_index"] = \
        relative_position_index(win, win).astype(np.int64)
    _qkv(sd, f"{prefix}.attn.qkv", p["attn"]["qkv"])
    _linear(sd, f"{prefix}.attn.proj", p["attn"]["proj"])
    if "modulator" in p:
        sd[f"{prefix}.modulator.weight"] = _np(p["modulator"])
    if "cross_modulator" in p:
        sd[f"{prefix}.cross_modulator.weight"] = _np(p["cross_modulator"])
        _layernorm(sd, f"{prefix}.norm_cross", p["norm_cross"])
        _qkv(sd, f"{prefix}.cross_attn.qkv", p["cross_attn"]["qkv"])
        _linear(sd, f"{prefix}.cross_attn.proj", p["cross_attn"]["proj"])
    m = p["mlp"]
    if "fc1" in m:
        _mlp(sd, f"{prefix}.mlp", m)
    else:
        _leff(sd, f"{prefix}.mlp", m)


def export_uformer(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """flax params (from Uformer.init / converter) -> torch state_dict
    with the reference's key names."""
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    _conv(sd, "input_proj.proj.0", p["input_proj"]["proj"])
    _conv(sd, "output_proj.proj.0", p["output_proj"]["proj"])
    for name, sub in p.items():
        m = re.match(r"(encoderlayer_\d|decoderlayer_\d|conv)$", name)
        if m:
            for bname, bp in sub.items():
                i = bname.split("_")[1]
                _block(sd, f"{name}.blocks.{i}", bp)
        elif name.startswith("dowsample_"):
            _conv(sd, f"{name}.conv.0", sub["conv"])
        elif name.startswith("upsample_"):
            _conv_transpose(sd, f"{name}.deconv.0", sub["deconv"])
    return sd


def save_torch_checkpoint(path: str, params: Dict[str, Any],
                          epoch: int = 0) -> str:
    import torch

    def t(v):
        v = np.ascontiguousarray(v)
        if not np.issubdtype(v.dtype, np.integer):
            v = v.astype(np.float32)
        return torch.from_numpy(v)

    sd = {k: t(v) for k, v in export_uformer(params).items()}
    torch.save({"epoch": epoch, "state_dict": sd, "optimizer": {}}, path)
    return path
