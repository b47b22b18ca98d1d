"""Learning-rate schedules matching the reference trainers.

The reference steps schedulers per *epoch* (`train/train_denoise.py:218`),
calling `scheduler.step()` once right after construction, so the lr used
during 1-indexed epoch `e` is:

  warmup+cosine (`--warmup`, train_denoise.py:88-93):
      e <= warmup_epochs: base * e / warmup_epochs
      else: cosine annealing over (nepoch - warmup_epochs) epochs,
            eta_min = 1e-6   (GradualWarmupScheduler(multiplier=1) around
            CosineAnnealingLR; warmup_scheduler/scheduler.py:25-37)
  StepLR fallback (train_denoise.py:94-98): base * 0.5 ** (e // 50)

These are exposed as optax-compatible step->lr callables with epoch
granularity (`steps_per_epoch` quantization).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_schedule(base_lr: float, nepoch: int, steps_per_epoch: int,
                           warmup_epochs: int = 3, eta_min: float = 1e-6):
    def schedule(step):
        epoch = step // steps_per_epoch + 1  # 1-indexed, constant per epoch
        warm = base_lr * epoch / warmup_epochs
        t = epoch - warmup_epochs
        total = max(nepoch - warmup_epochs, 1)
        cos = eta_min + 0.5 * (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * t / total))
        return jnp.where(epoch <= warmup_epochs, warm, cos)

    return schedule


def step_lr_schedule(base_lr: float, steps_per_epoch: int,
                     step_size: int = 50, gamma: float = 0.5):
    def schedule(step):
        epoch = step // steps_per_epoch + 1
        return base_lr * gamma ** (epoch // step_size)

    return schedule
