"""Cross-framework parity: JAX forward vs the torch reference forward.

The torch reference model is instantiated with random (seeded) weights,
its state_dict converted through `uformer_tpu.convert`, and both forwards
compared in fp32. Acceptance per SURVEY.md §7 step 4: <= 1e-4.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_loader import (
    build_reference_unet,
    build_reference_uformer,
    reference_available,
)
from uformer_tpu.convert import convert_uformer, convert_unet
from uformer_tpu.models import Uformer, UNet

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="torch reference not available")

TOL = 1e-4


def _run_pair(torch_model, jax_model, convert_fn, size=64, in_ch=3,
              batch=1):
    import torch

    rng = np.random.default_rng(42)
    x = rng.uniform(0, 1, (batch, in_ch, size, size)).astype(np.float32)
    with torch.no_grad():
        yt = torch_model(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, convert_fn(sd))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))  # NCHW -> NHWC
    yj = jax_model.apply(params, xj)
    yj = np.asarray(yj).transpose(0, 3, 1, 2)
    return yt, yj


def _max_diff(a, b):
    return float(np.abs(a - b).max())


@pytest.mark.slow
def test_parity_uformer_leff_shift_modulator():
    """Flagship configuration: leff + shift + decoder modulator."""
    kw = dict(img_size=64, embed_dim=8, depths=[2] * 9,
              num_heads=[1, 2, 4, 8, 8, 8, 4, 2, 1], win_size=8,
              mlp_ratio=4.0, token_projection="linear", token_mlp="leff",
              modulator=True, shift_flag=True)
    tm = build_reference_uformer(**kw)
    jm = Uformer(img_size=64, embed_dim=8, depths=(2,) * 9,
                 num_heads=(1, 2, 4, 8, 8, 8, 4, 2, 1), win_size=8,
                 token_projection="linear", token_mlp="leff", modulator=True,
                 shift_flag=True, attn_backend="jnp")
    yt, yj = _run_pair(tm, jm, convert_uformer)
    assert _max_diff(yt, yj) < TOL, _max_diff(yt, yj)


def test_parity_uformer_mlp_noshift():
    kw = dict(img_size=64, embed_dim=8, depths=[1] * 9,
              num_heads=[1, 2, 4, 8, 8, 8, 4, 2, 1], win_size=8,
              token_projection="linear", token_mlp="mlp",
              modulator=False, shift_flag=False)
    tm = build_reference_uformer(**kw)
    jm = Uformer(img_size=64, embed_dim=8, depths=(1,) * 9,
                 num_heads=(1, 2, 4, 8, 8, 8, 4, 2, 1), win_size=8,
                 token_projection="linear", token_mlp="mlp", modulator=False,
                 shift_flag=False, attn_backend="jnp")
    yt, yj = _run_pair(tm, jm, convert_uformer)
    assert _max_diff(yt, yj) < TOL, _max_diff(yt, yj)


def test_parity_uformer_conv_projection():
    kw = dict(img_size=64, embed_dim=8, depths=[1] * 9,
              num_heads=[1, 2, 4, 8, 8, 8, 4, 2, 1], win_size=8,
              token_projection="conv", token_mlp="leff",
              modulator=True, shift_flag=False)
    tm = build_reference_uformer(**kw)
    jm = Uformer(img_size=64, embed_dim=8, depths=(1,) * 9,
                 num_heads=(1, 2, 4, 8, 8, 8, 4, 2, 1), win_size=8,
                 token_projection="conv", token_mlp="leff", modulator=True,
                 shift_flag=False, attn_backend="jnp")
    yt, yj = _run_pair(tm, jm, convert_uformer)
    assert _max_diff(yt, yj) < TOL, _max_diff(yt, yj)


def test_parity_uformer_cross_modulator():
    """Exercises the cross-modulator branch incl. the reference's
    norm_cross quirk (model.py:947-948)."""
    kw = dict(img_size=64, embed_dim=8, depths=[1] * 9,
              num_heads=[1, 2, 4, 8, 8, 8, 4, 2, 1], win_size=8,
              token_projection="linear", token_mlp="leff",
              modulator=True, cross_modulator=True, shift_flag=False)
    tm = build_reference_uformer(**kw)
    jm = Uformer(img_size=64, embed_dim=8, depths=(1,) * 9,
                 num_heads=(1, 2, 4, 8, 8, 8, 4, 2, 1), win_size=8,
                 token_projection="linear", token_mlp="leff", modulator=True,
                 cross_modulator=True, shift_flag=False, attn_backend="jnp")
    yt, yj = _run_pair(tm, jm, convert_uformer)
    assert _max_diff(yt, yj) < TOL, _max_diff(yt, yj)


def test_parity_unet():
    tm = build_reference_unet(dim=8)
    jm = UNet(dim=8)
    yt, yj = _run_pair(tm, jm, convert_unet)
    assert _max_diff(yt, yj) < TOL, _max_diff(yt, yj)


def test_parity_dataparallel_prefix_stripped(tmp_path):
    """Checkpoint round-trip through the .pth format with module. prefix
    (reference utils/model_utils.py:23-33, train_denoise.py:207-210)."""
    import torch

    tm = build_reference_unet(dim=8)
    path = tmp_path / "model_best.pth"
    torch.save({
        "epoch": 3,
        "state_dict": {f"module.{k}": v for k, v in tm.state_dict().items()},
        "optimizer": {},
    }, path)
    from uformer_tpu.convert import load_state_dict
    sd = load_state_dict(str(path))
    assert all(not k.startswith("module.") for k in sd)
    params = convert_unet(sd)
    jm = UNet(dim=8)
    x = np.random.default_rng(0).uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        yt = tm(torch.from_numpy(x)).numpy()
    yj = jm.apply(jax.tree_util.tree_map(jnp.asarray, params),
                  jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert _max_diff(yt, np.asarray(yj).transpose(0, 3, 1, 2)) < TOL


def test_parity_input_mask_path():
    """The user-input-mask branch (F.interpolate nearest + outer-product
    bias, reference model.py:913-919) vs torch, B=1 (the reference only
    supports batch-1 masks)."""
    import torch

    kw = dict(img_size=64, embed_dim=8, depths=[1] * 9,
              num_heads=[1, 2, 4, 8, 8, 8, 4, 2, 1], win_size=8,
              token_projection="linear", token_mlp="leff",
              modulator=True, shift_flag=False)
    tm = build_reference_uformer(**kw)
    x = np.random.default_rng(0).uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    mask = np.zeros((1, 1, 64, 64), np.float32)
    mask[:, :, :, 48:] = 1.0
    with torch.no_grad():
        yt = tm(torch.from_numpy(x), mask=torch.from_numpy(mask)).numpy()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, convert_uformer(sd))
    jm = Uformer(img_size=64, embed_dim=8, depths=(1,) * 9,
                 num_heads=(1, 2, 4, 8, 8, 8, 4, 2, 1), win_size=8,
                 modulator=True, shift_flag=False, attn_backend="jnp")
    yj = np.asarray(jm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                             mask=jnp.asarray(mask))).transpose(0, 3, 1, 2)
    assert _max_diff(yt, yj) < TOL


def test_export_roundtrip():
    """JAX -> torch .pth exporter inverts the converter exactly, and the
    exported checkpoint loads into the torch reference model."""
    import torch

    kw = dict(img_size=64, embed_dim=8, depths=[1] * 9,
              num_heads=[1, 2, 4, 8, 8, 8, 4, 2, 1], win_size=8,
              token_projection="linear", token_mlp="leff",
              modulator=True, shift_flag=True)
    tm = build_reference_uformer(**kw)
    sd0 = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_uformer(sd0)

    from uformer_tpu.convert.torch_exporter import export_uformer

    sd1 = export_uformer(params)
    assert set(sd1) == set(sd0), (set(sd0) - set(sd1), set(sd1) - set(sd0))
    for k in sd0:
        np.testing.assert_array_equal(sd1[k], sd0[k], err_msg=k)
    # exported state_dict loads strictly into the torch reference
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd1.items()}, strict=True)
