"""Jittable batch augmentations.

Re-designs the reference's host-side augmentation as device-side, jittable
batch transforms:
  * 8 dihedral ops (reference Augment_RGB_torch, utils/dataset_utils.py:5-30,
    chosen per-sample by `random.getrandbits(3)`, dataset_denoise.py:68-71)
  * MixUp with Beta(1.2, 1.2) pairing (utils/dataset_utils.py:34-49)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dihedral_transform(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Apply dihedral op k in [0,8) to one image (H, W, C).

    Index map mirrors the reference transform0-7: 0 identity,
    1-3 rot90 x{1,2,3}, 4 flip, 5-7 rot90 x{1,2,3} then flip.
    (torch.rot90 dims (1,2) on CHW == rotation in the HW plane;
    `.flip(1)` on CHW flips H.)
    """
    branches = [
        lambda t: t,
        lambda t: jnp.rot90(t, 1, (0, 1)),
        lambda t: jnp.rot90(t, 2, (0, 1)),
        lambda t: jnp.rot90(t, 3, (0, 1)),
        lambda t: jnp.flip(t, 0),
        lambda t: jnp.flip(jnp.rot90(t, 1, (0, 1)), 0),
        lambda t: jnp.flip(jnp.rot90(t, 2, (0, 1)), 0),
        lambda t: jnp.flip(jnp.rot90(t, 3, (0, 1)), 0),
    ]
    return jax.lax.switch(k, branches, x)


def random_dihedral_batch(rng, *arrays):
    """Same random dihedral op per sample applied to all arrays (paired
    gt/noisy must transform together). arrays: (B, H, W, C), H == W for
    the rotation ops (training patches are square)."""
    B = arrays[0].shape[0]
    ks = jax.random.randint(rng, (B,), 0, 8)
    out = tuple(
        jax.vmap(dihedral_transform)(a, ks) for a in arrays)
    return out if len(out) > 1 else out[0]


def mixup_batch(rng, target, inp, alpha: float = 1.2):
    """Pairwise mixup of (target, input) with lam ~ Beta(1.2, 1.2)
    (reference MixUp_AUG.aug). Returns mixed (target, input)."""
    B = target.shape[0]
    rng_lam, rng_perm = jax.random.split(rng)
    lam = jax.random.beta(rng_lam, alpha, alpha, (B, 1, 1, 1),
                          dtype=jnp.float32)
    perm = jax.random.permutation(rng_perm, B)
    t2, i2 = target[perm], inp[perm]
    target = lam * target + (1 - lam) * t2
    inp = lam * inp + (1 - lam) * i2
    return target, inp


def random_crop_pair(rng, gt, noisy, ps: int):
    """Random aligned ps x ps crop of a (H, W, C) pair
    (reference dataset_denoise.py:59-66)."""
    H, W = gt.shape[:2]
    rh = jax.random.randint(rng, (), 0, H - ps + 1)
    rw = jax.random.randint(jax.random.fold_in(rng, 1), (), 0, W - ps + 1)
    g = jax.lax.dynamic_slice(gt, (rh, rw, 0), (ps, ps, gt.shape[2]))
    n = jax.lax.dynamic_slice(noisy, (rh, rw, 0), (ps, ps, noisy.shape[2]))
    return g, n
