"""Training losses (reference `/root/reference/losses.py`).

CharbonnierLoss is the only loss the reference trainers use
(`train/train_denoise.py:124`); the TV losses are shipped for capability
parity (`losses.py:8-37`, unused upstream).
"""

from __future__ import annotations

import jax.numpy as jnp


def charbonnier_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     eps: float = 1e-3) -> jnp.ndarray:
    """mean(sqrt(diff^2 + eps^2)) with eps=1e-3 (reference losses.py:41-52).

    Note the reference adds eps**2 inside the sqrt of (diff*diff + eps*eps).
    """
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(diff * diff + eps * eps))


def tv_loss(x: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """Anisotropic total variation, normalized like reference losses.py:8-24
    (sum of squared neighbor diffs, each normalized by its element count,
    x2, averaged over batch). x: (B, H, W, C)."""
    B, H, W, C = x.shape
    x = x.astype(jnp.float32)
    h_tv = jnp.square(x[:, 1:] - x[:, :-1]).sum()
    w_tv = jnp.square(x[:, :, 1:] - x[:, :, :-1]).sum()
    count_h = (H - 1) * W * C
    count_w = H * (W - 1) * C
    return weight * 2.0 * (h_tv / count_h + w_tv / count_w) / B
