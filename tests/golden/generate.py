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


if __name__ == "__main__":
    main()
