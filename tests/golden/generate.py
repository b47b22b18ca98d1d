"""Generate recorded-activation parity goldens (VERDICT round 1, item 9).

Runs the torch reference (`/root/reference/model.py`) ONCE with seeded
weights and records, into committed .npz files:
  * the seeded input and final output,
  * per-stage activations (input_proj, encoderlayer_k, dowsample_k, conv,
    upsample_k, decoderlayer_k, output_proj — hooks on the named modules
    of reference model.py:1104-1247), and
  * the full state_dict (raw torch arrays; converted at test time by
    `uformer_tpu.convert.convert_uformer`, which is pure numpy).

tests/test_golden_parity.py then checks the JAX forward against these
files WITHOUT torch or the reference tree — the 0.05 dB parity budget
stays auditable after the live reference disappears (SURVEY.md §4c).

Usage:  python tests/golden/generate.py   (requires /root/reference + torch)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__))

STAGES = (["input_proj"]
          + [f"encoderlayer_{k}" for k in range(4)]
          + [f"dowsample_{k}" for k in range(4)]
          + ["conv"]
          + [f"upsample_{k}" for k in range(4)]
          + [f"decoderlayer_{k}" for k in range(4)]
          + ["output_proj"])

FLAGSHIP = dict(img_size=64, embed_dim=8, depths=[2] * 9,
                num_heads=[1, 2, 4, 8, 8, 8, 4, 2, 1], win_size=8,
                mlp_ratio=4.0, token_projection="linear", token_mlp="leff",
                modulator=True, shift_flag=True)

CONVPROJ = dict(img_size=64, embed_dim=8, depths=[1] * 9,
                num_heads=[1, 2, 4, 8, 8, 8, 4, 2, 1], win_size=8,
                mlp_ratio=4.0, token_projection="conv", token_mlp="mlp",
                modulator=True, cross_modulator=True, shift_flag=True)

# The shipped flagship geometry (registry "Uformer_B" / reference
# model_utils.py:76-78) at 128² — the scale the fused kernels specialize
# for. Weights are NOT stored (50.9M params ≈ 200 MB); they are
# regenerated at test time from SEED_B + the recorded (key, shape) list
# by `seeded_state_dict` (numpy-only — no torch needed), so only the
# activations are committed (fp16, ~6 MB). VERDICT round 2, item 7.
UFORMER_B = dict(img_size=128, embed_dim=32,
                 depths=[1, 2, 8, 8, 2, 8, 8, 2, 1],
                 num_heads=[1, 2, 4, 8, 16, 16, 8, 4, 2], win_size=8,
                 mlp_ratio=4.0, token_projection="linear", token_mlp="leff",
                 modulator=True, shift_flag=True)

SEED_B = 1234


def _seeded_value(key: str, shape: tuple, rng) -> np.ndarray:
    """Deterministic well-conditioned init (torch weight layout).

    1-dim '.weight' keys are LayerNorm scales -> near 1; other 1-dim
    keys are biases -> small noise; >=2-dim weights -> N(0, 1/fan_in)
    with fan_in = prod(shape[1:]), which keeps activations O(1) through
    all 33 blocks so fp16-recorded goldens stay meaningful."""
    if len(shape) == 1:
        if key.endswith(".weight"):
            return (1.0 + 0.05 * rng.standard_normal(shape)) \
                .astype(np.float32)
        return (0.02 * rng.standard_normal(shape)).astype(np.float32)
    fan_in = 1
    for s in shape[1:]:
        fan_in *= int(s)
    return (rng.standard_normal(shape) / np.sqrt(fan_in)) \
        .astype(np.float32)


def seeded_state_dict(keys_shapes, seed=SEED_B):
    """Regenerate the full parameter dict from the recorded key order.

    Pure numpy (PCG64 streams are stable across numpy versions) — both
    the torch generation side and the torch-free test side call this."""
    rng = np.random.default_rng(seed)
    return {k: _seeded_value(k, tuple(shape), rng)
            for k, shape in keys_shapes}


def record_seeded(name: str, kwargs: dict, seed: int):
    """Record activations of the reference under regenerated weights,
    committing activations only (fp16) + the (key, shape) manifest."""
    import json

    import torch

    from tests.reference_loader import build_reference_uformer

    model = build_reference_uformer(**kwargs)
    keys_shapes = [[k, list(v.shape)] for k, v in model.named_parameters()]
    sd = seeded_state_dict(keys_shapes, seed)
    model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                          strict=False)  # buffers keep module defaults

    rng = np.random.default_rng(42)
    x = rng.uniform(0, 1, (1, 3, kwargs["img_size"],
                           kwargs["img_size"])).astype(np.float32)

    acts = {}
    hooks = []
    for stage in STAGES:
        def make_hook(s):
            def hook(_m, _inp, out):
                acts[f"act/{s}"] = out.detach().numpy().astype(np.float16)
            return hook
        hooks.append(
            getattr(model, stage).register_forward_hook(make_hook(stage)))
    with torch.no_grad():
        y = model(torch.from_numpy(x)).numpy()
    for h in hooks:
        h.remove()

    data = {"input": x, "output": y,
            "sd_manifest": np.array(json.dumps(keys_shapes)),
            "seed": np.array(seed)}
    data.update(acts)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    np.savez_compressed(path, **data)
    print(f"{path}: {len(data)} arrays, "
          f"{os.path.getsize(path) / 1e6:.2f} MB")


def record(name: str, kwargs: dict, with_stages: bool):
    import torch

    from tests.reference_loader import build_reference_uformer

    model = build_reference_uformer(**kwargs)
    rng = np.random.default_rng(42)
    x = rng.uniform(0, 1, (1, 3, kwargs["img_size"],
                           kwargs["img_size"])).astype(np.float32)

    acts = {}
    hooks = []
    if with_stages:
        for stage in STAGES:
            def make_hook(s):
                def hook(_m, _inp, out):
                    acts[f"act/{s}"] = out.detach().numpy()
                return hook
            hooks.append(
                getattr(model, stage).register_forward_hook(make_hook(stage)))
    with torch.no_grad():
        y = model(torch.from_numpy(x)).numpy()
    for h in hooks:
        h.remove()

    data = {"input": x, "output": y}
    data.update(acts)
    for k, v in model.state_dict().items():
        data[f"sd/{k}"] = v.detach().numpy()
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    np.savez_compressed(path, **data)
    print(f"{path}: {len(data)} arrays, "
          f"{os.path.getsize(path) / 1e6:.2f} MB")


def main():
    from tests.reference_loader import reference_available

    if not reference_available():
        raise SystemExit("torch reference not available — cannot generate")
    record("uformer_flagship", FLAGSHIP, with_stages=True)
    record("uformer_convproj_crossmod", CONVPROJ, with_stages=False)
    record_seeded("uformer_b_128", UFORMER_B, SEED_B)


if __name__ == "__main__":
    main()
