"""The jitted train/eval steps.

Replaces the reference's Python-visible autocast/GradScaler/DataParallel
dance (`/root/reference/train/train_denoise.py:171-186`) with one jitted,
mesh-sharded step: bf16 compute via the model's dtype policy (no loss
scaler needed on TPU), fp32 master params, Charbonnier loss, optax AdamW.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from uformer_tpu.train.losses import charbonnier_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)


def make_optimizer(lr_schedule, weight_decay: float = 0.02,
                   betas=(0.9, 0.999), eps: float = 1e-8,
                   grad_clip: Optional[float] = None,
                   ) -> optax.GradientTransformation:
    """AdamW matching the reference recipe (train_denoise.py:76-77:
    lr 2e-4, betas (0.9, 0.999), eps 1e-8, wd 0.02; decay applied to all
    params — the reference's no_weight_decay sets exist on the model,
    model.py:1258-1264, but its trainers never use them)."""
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(lr_schedule, b1=betas[0], b2=betas[1], eps=eps,
                             weight_decay=weight_decay))
    return optax.chain(*chain)


def make_train_step(model, loss_fn: Callable = charbonnier_loss,
                    mixup_after_epoch: Optional[int] = None,
                    steps_per_epoch: int = 1):
    """Build the jittable train step.

    batch: {'input': (B,H,W,C), 'target': (B,H,W,3)} — already sharded.
    If `mixup_after_epoch` is set, MixUp (reference
    utils/dataset_utils.py:34-49, enabled after epoch 5 in
    train_denoise.py:178-179) runs inside the step under lax.cond so the
    one compiled program covers both phases.
    """
    from uformer_tpu.data.augment import mixup_batch

    def train_step(state: TrainState, batch, rng):
        rng_mix, rng_drop = jax.random.split(rng)
        inp, tgt = batch["input"], batch["target"]
        assert inp.shape[0] == tgt.shape[0], (
            f"input/target batch mismatch: {inp.shape} vs {tgt.shape}")

        if mixup_after_epoch is not None:
            epoch = state.step // steps_per_epoch + 1

            def do_mix(args):
                t, i = args
                return mixup_batch(rng_mix, t, i)

            tgt, inp = jax.lax.cond(
                epoch > mixup_after_epoch, do_mix, lambda a: a, (tgt, inp))

        def loss(p):
            pred = model.apply(p, inp, deterministic=False,
                               rngs={"dropout": rng_drop})
            return loss_fn(pred, tgt)

        loss_val, grads = jax.value_and_grad(loss)(state.params)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, loss_val

    return train_step


def make_eval_step(model):
    """Forward + clamp to [0,1] (reference train_denoise.py:196-199)."""

    def eval_step(params, inp):
        pred = model.apply(params, inp)
        return jnp.clip(pred, 0.0, 1.0)

    return eval_step
