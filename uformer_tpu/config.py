"""Configuration / flag system (reference `/root/reference/options.py`).

One dataclass holding every reference flag with the same names and
defaults (batch_size 32, nepoch 250, AdamW lr 2e-4 wd 0.02, train_ps 128,
win_size 8, embed_dim 32, ...), plus an argparse bridge for the CLI
scripts. Vestigial reference flags (the ViT group, DDP group) are kept as
accepted-but-unused for CLI compatibility.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class Options:
    # global settings (options.py:10-23)
    batch_size: int = 32
    nepoch: int = 250
    workers: int = 4
    dataset: str = "SIDD"
    pretrain_weights: str = "./log/Uformer_B/models/model_best.pth"
    optimizer: str = "adamw"
    lr_initial: float = 2e-4
    step_lr: int = 50
    weight_decay: float = 0.02
    gpu: str = ""  # accepted, ignored (TPU)
    arch: str = "Uformer_B"
    mode: str = "denoising"
    dd_in: int = 3

    # saving (options.py:26-29)
    save_dir: str = "./logs/"
    save_images: bool = False
    env: str = "_"
    checkpoint: int = 50

    # Uformer arch (options.py:32-38)
    norm_layer: str = "nn.LayerNorm"
    embed_dim: int = 32
    win_size: int = 8
    token_projection: str = "linear"
    token_mlp: str = "leff"
    att_se: bool = False
    modulator: bool = False

    # vestigial ViT flags (options.py:41-48) — parsed, unused, as upstream
    vit_dim: int = 256
    vit_depth: int = 12
    vit_nheads: int = 8
    vit_mlp_dim: int = 512
    vit_patch_size: int = 16
    global_skip: bool = False
    local_skip: bool = False
    vit_share: bool = False

    # training (options.py:51-57)
    train_ps: int = 128
    val_ps: int = 128
    resume: bool = False
    train_dir: str = "./datasets/SIDD/train"
    val_dir: str = "./datasets/SIDD/val"
    warmup: bool = False  # reference default (options.py:56); recipes pass --warmup
    warmup_epochs: int = 3

    # distributed (subsumes options.py:60-62 DDP flags)
    mesh_data: Optional[int] = None   # devices on the data axis (None=all)
    mesh_model: int = 1

    # TPU-native extras
    dtype: str = "bfloat16"           # compute dtype for training
    attn_backend: str = "auto"
    use_checkpoint: bool = False      # gradient checkpointing per block
    grad_clip: Optional[float] = None
    seed: int = 1234


def add_options_to_parser(parser: argparse.ArgumentParser,
                          defaults: Optional[Options] = None):
    d = defaults or Options()
    for f in dataclasses.fields(Options):
        v = getattr(d, f.name)
        name = "--" + f.name
        if f.type == "bool" or isinstance(v, bool):
            # BooleanOptionalAction gives --flag / --no-flag so every bool
            # is settable both ways from the CLI regardless of its default
            parser.add_argument(name, action=argparse.BooleanOptionalAction,
                                default=v)
        elif v is None:
            parser.add_argument(name, type=int, default=None)
        else:
            parser.add_argument(name, type=type(v), default=v)
    return parser


def options_from_args(args: argparse.Namespace) -> Options:
    kw = {f.name: getattr(args, f.name) for f in dataclasses.fields(Options)
          if hasattr(args, f.name)}
    return Options(**kw)
