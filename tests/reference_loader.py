"""Load the upstream torch reference model for parity testing.

The reference (`/root/reference/model.py`) is imported at test time to
record golden activations — we run it, never copy it. It imports
`timm.models.layers.{DropPath, to_2tuple, trunc_normal_}`; timm is not in
this image, so we install a minimal shim implementing those three public
APIs before loading.

Tests that use this module must skip gracefully when the reference tree
or torch is unavailable.
"""

from __future__ import annotations

import importlib.util
import itertools
import math
import os
import sys
import types

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    if not os.path.exists(os.path.join(REFERENCE_DIR, "model.py")):
        return False
    try:
        import torch  # noqa: F401
        return True
    except ImportError:
        return False


def _install_timm_shim():
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    def to_2tuple(x):
        if isinstance(x, (tuple, list)):
            return tuple(x)
        return (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std)
            tensor.clamp_(min=mean + a * std, max=mean + b * std)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


_ref_module = None


def load_reference_model_module():
    """Import /root/reference/model.py under a private module name."""
    global _ref_module
    if _ref_module is not None:
        return _ref_module
    _install_timm_shim()
    spec = importlib.util.spec_from_file_location(
        "uformer_reference_model", os.path.join(REFERENCE_DIR, "model.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["uformer_reference_model"] = mod
    spec.loader.exec_module(mod)
    _ref_module = mod
    return mod


def build_reference_uformer(**kwargs):
    """Construct the reference torch Uformer in eval mode (seeded)."""
    import torch

    mod = load_reference_model_module()
    torch.manual_seed(0)
    model = mod.Uformer(**kwargs)
    # Upstream quirk: ConvProjection passes `bias` into SepConv2d's
    # `dilation` positional slot (model.py:391-393 vs 344-351); torch 1.8
    # coerced True -> 1, modern torch rejects it. Normalize to restore the
    # torch-1.8 effective behavior (dilation=1, conv bias always on).
    for m in model.modules():
        if isinstance(m, torch.nn.Conv2d) and any(
                isinstance(d, bool) for d in m.dilation):
            m.dilation = tuple(int(d) for d in m.dilation)
    model.eval()
    return model


def build_reference_unet(dim=8):
    import torch

    mod = load_reference_model_module()
    torch.manual_seed(0)
    model = mod.UNet(dim=dim)
    model.eval()
    return model
