"""Cross-framework parity vs RECORDED torch activations (no torch needed).

tests/golden/*.npz hold seeded inputs, per-stage activations, outputs and
state_dicts recorded once from `/root/reference/model.py` by
tests/golden/generate.py. Here the state_dict is converted (pure numpy)
and the JAX forward is checked stage-by-stage — the parity budget stays
auditable without torch or the reference tree (SURVEY.md §4c; VERDICT
round 1 item 9).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uformer_tpu.convert import convert_uformer
from uformer_tpu.models import Uformer
from tests.golden.generate import CONVPROJ, FLAGSHIP, STAGES

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "golden")
TOL = 1e-4


def _load(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    data = np.load(path)
    sd = {k[len("sd/"):]: data[k] for k in data.files if k.startswith("sd/")}
    acts = {k[len("act/"):]: data[k] for k in data.files
            if k.startswith("act/")}
    return data["input"], data["output"], acts, sd


def _build(kw):
    return Uformer(
        img_size=kw["img_size"], embed_dim=kw["embed_dim"],
        depths=tuple(kw["depths"]), num_heads=tuple(kw["num_heads"]),
        win_size=kw["win_size"], mlp_ratio=kw["mlp_ratio"],
        token_projection=kw["token_projection"],
        token_mlp={"mlp": "ffn"}.get(kw["token_mlp"], kw["token_mlp"]),
        modulator=kw.get("modulator", False),
        cross_modulator=kw.get("cross_modulator", False),
        shift_flag=kw["shift_flag"], attn_backend="jnp")


def _to_nhwc(a):
    """Torch stage activation -> NHWC: (B,L,C) token layouts via sqrt(L),
    (B,C,H,W) conv layouts via transpose."""
    if a.ndim == 3:
        B, L, C = a.shape
        s = int(round(np.sqrt(L)))
        assert s * s == L
        return a.reshape(B, s, s, C)
    return a.transpose(0, 2, 3, 1)


@pytest.mark.slow
def test_flagship_stage_by_stage():
    x, y, acts, sd = _load("uformer_flagship")
    model = _build(FLAGSHIP)
    params = jax.tree_util.tree_map(jnp.asarray, convert_uformer(sd))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    yj, state = model.apply(params, xj, capture_intermediates=True)

    inter = state["intermediates"]
    for stage in STAGES:
        got = np.asarray(inter[stage]["__call__"][0])
        want = _to_nhwc(acts[stage])
        err = np.abs(got - want).max()
        assert err <= TOL, f"stage {stage}: max diff {err}"

    np.testing.assert_allclose(
        np.asarray(yj).transpose(0, 3, 1, 2), y, atol=TOL, rtol=0)


@pytest.mark.slow
def test_convproj_crossmod_output():
    x, y, acts, sd = _load("uformer_convproj_crossmod")
    model = _build(CONVPROJ)
    params = jax.tree_util.tree_map(jnp.asarray, convert_uformer(sd))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    yj = model.apply(params, xj)
    np.testing.assert_allclose(
        np.asarray(yj).transpose(0, 3, 1, 2), y, atol=TOL, rtol=0)


@pytest.mark.slow
def test_uformer_b_flagship_scale():
    """Parity at the SHIPPED scale (embed_dim 32, B-depths, 128²) without
    torch: weights regenerate from the committed seed + manifest, so only
    fp16 activations live in the npz (VERDICT round 2, item 7)."""
    import json

    from tests.golden.generate import UFORMER_B, seeded_state_dict

    path = os.path.join(GOLDEN_DIR, "uformer_b_128.npz")
    data = np.load(path)
    keys_shapes = json.loads(str(data["sd_manifest"]))
    sd = seeded_state_dict(keys_shapes, int(data["seed"]))

    model = _build(UFORMER_B)
    params = jax.tree_util.tree_map(jnp.asarray, convert_uformer(sd))
    xj = jnp.asarray(data["input"].transpose(0, 2, 3, 1))
    yj, state = model.apply(params, xj, capture_intermediates=True)

    inter = state["intermediates"]
    for stage in STAGES:
        got = np.asarray(inter[stage]["__call__"][0])
        want = _to_nhwc(data[f"act/{stage}"].astype(np.float32))
        err = np.abs(got - want).max()
        # activations are recorded fp16: storage quantization is relative
        # (eps ~ 2^-11), so scale the budget by the stage's magnitude
        # (deep levels reach |act| ~ 10 after 4 downsample convs)
        tol = 1e-3 + 1e-3 * float(np.abs(want).max())
        assert err <= tol, f"stage {stage}: max diff {err} > {tol}"

    np.testing.assert_allclose(
        np.asarray(yj).transpose(0, 3, 1, 2), data["output"],
        atol=1e-3, rtol=0)
