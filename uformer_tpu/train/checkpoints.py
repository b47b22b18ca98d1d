"""Checkpoint save/restore (reference `/root/reference/utils/model_utils.py:18-54`
and the trainers' best/latest/epoch-N protocol, train_denoise.py:207-235).

Orbax-backed `{epoch, params, opt_state}` checkpoints with the same three
roles (model_best, model_latest, model_epoch_N). `load_params` also accepts
a torch `.pth` file and converts it (the reference checkpoint format),
so released reference checkpoints drop straight in.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


_ASYNC = None


def _async_checkpointer():
    global _ASYNC
    if _ASYNC is None:
        import orbax.checkpoint as ocp

        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC


def wait_for_saves() -> None:
    """Block until every in-flight async save has committed to disk."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def save_checkpoint(model_dir: str, name: str, epoch: int, params: Any,
                    opt_state: Any = None, step: Optional[int] = None,
                    async_save: bool = False) -> str:
    """Save {epoch, params, opt_state, step} under <model_dir>/<name>.

    `step` is the optimizer step count; persisting it lets resume continue
    mixup gating / LR logging from the true position (reference resumes
    mid-schedule too: train_denoise.py:90-98).

    `async_save=True` (the trainer's best/latest saves,
    train_denoise.py:207-210,226-235) returns after the device->host
    copy; serialization + disk write happen on a background thread so the
    step loop never blocks on them. Call :func:`wait_for_saves` before
    reading the file back (load paths here do it automatically)."""
    path = os.path.abspath(os.path.join(model_dir, name))
    ckpt = {"epoch": np.int64(epoch)}
    if step is not None:
        ckpt["step"] = np.int64(int(step))
    if async_save:
        # pass jax.Arrays straight through: orbax's only blocking phase
        # is the D2H copy; a prior in-flight save to the same path must
        # finish first (an epoch has passed — it long has)
        wait_for_saves()
        ckpt["params"] = params
        if opt_state is not None:
            ckpt["opt_state"] = opt_state
        _async_checkpointer().save(path, ckpt, force=True)
        return path
    ckpt["params"] = jax.device_get(params)
    if opt_state is not None:
        ckpt["opt_state"] = jax.device_get(opt_state)
    _checkpointer().save(path, ckpt, force=True)
    return path


def load_checkpoint(path: str, target: Optional[dict] = None) -> dict:
    """Restore a checkpoint; pass `target` (a matching pytree of arrays) to
    recover container types that serialization flattens (optax NamedTuple
    states restore as dicts without it)."""
    import orbax.checkpoint as ocp

    wait_for_saves()  # a half-committed async save must finish first
    path = os.path.abspath(path)
    if target is not None:
        return _checkpointer().restore(
            path, args=ocp.args.PyTreeRestore(item=target))
    return _checkpointer().restore(path)


def load_start_epoch(path: str) -> int:
    """Reference load_start_epoch (model_utils.py:40-44)."""
    return int(load_checkpoint(path)["epoch"])


def load_params(path: str, arch: str = "Uformer_B") -> Any:
    """Load params from an orbax dir or a torch .pth (auto-converted via
    uformer_tpu.convert; handles the DataParallel module. prefix)."""
    if path.endswith(".pth") or path.endswith(".pt"):
        from uformer_tpu.convert import convert_checkpoint

        return jax.tree_util.tree_map(
            np.asarray, convert_checkpoint(path, arch))
    ckpt = load_checkpoint(path)
    return ckpt["params"]


def load_optim(path: str) -> Tuple[Any, int]:
    """Restore (opt_state, epoch) for resume (reference load_optim,
    model_utils.py:47-54)."""
    ckpt = load_checkpoint(path)
    return ckpt.get("opt_state"), int(ckpt["epoch"])
