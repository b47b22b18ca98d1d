"""Parameter freezing utilities (reference `utils/model_utils.py:6-16`:
freeze / unfreeze / is_frozen).

In a functional framework "freezing" is an optimizer concern: these
helpers build optax masks / zero-update transforms from parameter-path
predicates, plus simple whole-tree state queries matching the reference
semantics.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax


def path_matches(path, pattern: str) -> bool:
    keys = [p.key for p in path if hasattr(p, "key")]
    return pattern in "/".join(keys)


def freeze_mask(params, frozen_predicate: Callable) -> dict:
    """Pytree of bools: True where the param is TRAINABLE."""
    return jax.tree_util.tree_map_with_path(
        lambda p, _: not frozen_predicate(p), params)


def freeze(tx: optax.GradientTransformation, params,
           frozen_predicate: Callable) -> optax.GradientTransformation:
    """Wrap an optimizer so params matching `frozen_predicate` get zero
    updates (the functional analogue of requires_grad=False)."""
    mask = freeze_mask(params, frozen_predicate)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(
            lambda trainable: "train" if trainable else "freeze", mask),
    )


def is_frozen(mask) -> bool:
    """True if every param is frozen (reference is_frozen checks all
    requires_grad flags)."""
    return not any(jax.tree_util.tree_leaves(mask))
