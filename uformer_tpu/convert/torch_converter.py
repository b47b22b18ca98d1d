"""PyTorch `.pth` checkpoint -> JAX pytree converter.

Consumes the reference checkpoint format
`{'epoch': int, 'state_dict': {...}, 'optimizer': {...}}`
(`/root/reference/train/train_denoise.py:207-210`), including the
DataParallel `module.` key prefix (`utils/model_utils.py:23-33`), and emits
flax params for `uformer_tpu.models.Uformer` / `UNet`.

Layout transforms:
  torch Linear  (out, in)        -> flax Dense kernel (in, out)       [T]
  torch Conv2d  (O, I, kh, kw)   -> flax Conv kernel  (kh, kw, I, O)  [2,3,1,0]
  torch depthwise Conv2d (C,1,k,k) -> dwconv kernel (k, k, C)
  torch ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose(transpose_kernel=True)
        kernel (kh, kw, O, I)                                         [2,3,1,0]
  nn.Embedding weight (N, C)     -> modulator param (N, C)            [copy]
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file to a flat {name: np.ndarray} dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def _linear(sd, prefix):
    p = {"kernel": sd[f"{prefix}.weight"].T}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _conv(sd, prefix):
    p = {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _conv_transpose(sd, prefix):
    # torch ConvTranspose2d weight is (I, O, kh, kw); with
    # transpose_kernel=True flax expects (kh, kw, O, I).
    p = {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _layernorm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _leff(sd, prefix):
    # reference LeFF (model.py:654-685): linear1.0 (Linear), dwconv.0
    # (depthwise Conv2d (C,1,3,3)), linear2.0 (Linear); FastLeFF shares the
    # same key structure (torch_dwconv DepthwiseConv2d also stores
    # weight (C,1,3,3)).
    dw = sd[f"{prefix}.dwconv.0.weight"]  # (C, 1, 3, 3)
    p = {
        "linear1_kernel": sd[f"{prefix}.linear1.0.weight"].T,
        "linear1_bias": sd[f"{prefix}.linear1.0.bias"],
        "linear2_kernel": sd[f"{prefix}.linear2.0.weight"].T,
        "linear2_bias": sd[f"{prefix}.linear2.0.bias"],
        "dwconv_kernel": dw[:, 0].transpose(1, 2, 0),  # (3, 3, C)
        "dwconv_bias": sd[f"{prefix}.dwconv.0.bias"],
    }
    if f"{prefix}.eca.conv.weight" in sd:
        # torch Conv1d weight (1, 1, k) -> (k, 1, 1) HIO
        p["eca"] = {"conv": sd[f"{prefix}.eca.conv.weight"].transpose(2, 1, 0)}
    return p


def _mlp(sd, prefix):
    return {"fc1": _linear(sd, f"{prefix}.fc1"),
            "fc2": _linear(sd, f"{prefix}.fc2")}


def _sepconv(sd, prefix):
    dw = sd[f"{prefix}.depthwise.weight"]  # (C, 1, k, k)
    p = {
        "depthwise_kernel": dw[:, 0].transpose(1, 2, 0),
        "pointwise": _conv(sd, f"{prefix}.pointwise"),
    }
    if f"{prefix}.depthwise.bias" in sd:
        p["depthwise_bias"] = sd[f"{prefix}.depthwise.bias"]
    return p


def _qkv(sd, prefix):
    if f"{prefix}.to_q.weight" in sd and sd[f"{prefix}.to_q.weight"].ndim == 2:
        # LinearProjection
        return {"to_q": _linear(sd, f"{prefix}.to_q"),
                "to_kv": _linear(sd, f"{prefix}.to_kv")}
    # ConvProjection (SepConv2d q/k/v)
    return {"to_q": _sepconv(sd, f"{prefix}.to_q"),
            "to_k": _sepconv(sd, f"{prefix}.to_k"),
            "to_v": _sepconv(sd, f"{prefix}.to_v")}


def _window_attention(sd, prefix):
    return {
        "relative_position_bias_table": sd[f"{prefix}.relative_position_bias_table"],
        "qkv": _qkv(sd, f"{prefix}.qkv"),
        "proj": _linear(sd, f"{prefix}.proj"),
    }


def _lewin_block(sd, prefix):
    p = {
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "attn": _window_attention(sd, f"{prefix}.attn"),
    }
    if f"{prefix}.modulator.weight" in sd:
        p["modulator"] = sd[f"{prefix}.modulator.weight"]
    if f"{prefix}.cross_modulator.weight" in sd:
        p["cross_modulator"] = sd[f"{prefix}.cross_modulator.weight"]
        p["norm_cross"] = _layernorm(sd, f"{prefix}.norm_cross")
        p["cross_attn"] = {
            "qkv": _qkv(sd, f"{prefix}.cross_attn.qkv"),
            "proj": _linear(sd, f"{prefix}.cross_attn.proj"),
        }
    if f"{prefix}.mlp.fc1.weight" in sd:
        p["mlp"] = _mlp(sd, f"{prefix}.mlp")
    else:
        p["mlp"] = _leff(sd, f"{prefix}.mlp")
    return p


def _basic_layer(sd, prefix):
    depths = set()
    pat = re.compile(re.escape(prefix) + r"\.blocks\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            depths.add(int(m.group(1)))
    return {
        f"blocks_{i}": _lewin_block(sd, f"{prefix}.blocks.{i}")
        for i in sorted(depths)
    }


def convert_uformer(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a reference Uformer state_dict to flax params (pure numpy)."""
    p: Dict[str, Any] = {
        "input_proj": {"proj": _conv(sd, "input_proj.proj.0")},
        "output_proj": {"proj": _conv(sd, "output_proj.proj.0")},
    }
    for k in range(4):
        p[f"encoderlayer_{k}"] = _basic_layer(sd, f"encoderlayer_{k}")
        p[f"dowsample_{k}"] = {"conv": _conv(sd, f"dowsample_{k}.conv.0")}
        p[f"upsample_{k}"] = {
            "deconv": _conv_transpose(sd, f"upsample_{k}.deconv.0")}
        p[f"decoderlayer_{k}"] = _basic_layer(sd, f"decoderlayer_{k}")
    p["conv"] = _basic_layer(sd, "conv")
    return {"params": p}


def _convblock(sd, prefix):
    return {
        "conv1": _conv(sd, f"{prefix}.block.0"),
        "conv2": _conv(sd, f"{prefix}.block.2"),
        "conv11": _conv(sd, f"{prefix}.conv11"),
    }


def convert_unet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    for i in range(1, 10):
        p[f"ConvBlock{i}"] = _convblock(sd, f"ConvBlock{i}")
    for i in range(1, 5):
        p[f"pool{i}"] = _conv(sd, f"pool{i}")
    for i in range(6, 10):
        p[f"upv{i}"] = _conv_transpose(sd, f"upv{i}")
    p["conv10"] = _conv(sd, "conv10")
    return {"params": p}


def convert_checkpoint(path: str, arch: str = "Uformer_B") -> Dict[str, Any]:
    sd = load_state_dict(path)
    if arch == "UNet":
        return convert_unet(sd)
    return convert_uformer(sd)
