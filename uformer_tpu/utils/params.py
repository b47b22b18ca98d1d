"""Parameter utilities: fast init, counting, pytree labeling."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_params_fast(model, *args, rng=None, **kwargs):
    """Initialize params on-device from shapes only — no model forward pass.

    `model.init` runs a full forward; for a 41-block Uformer_B that costs a
    large trace+compile. This traces only `eval_shape` (seconds) and fills
    the tree inside one jitted program, entirely on device — important on
    high-latency device links where per-leaf or bulk host->device
    transfers dominate.

    Init distributions are approximated (trunc-normal 0.02 for kernels,
    zeros for biases, ones for LayerNorm scales, N(0,1) for modulators) —
    use `model.init` when exact init reproducibility matters.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(model.init, rng, *args, **kwargs)
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    paths = [p for p, _ in paths_leaves]
    leaf_shapes = [l for _, l in paths_leaves]

    def fill(key):
        keys = jax.random.split(key, len(leaf_shapes))
        leaves = []
        for i, (path, leaf) in enumerate(zip(paths, leaf_shapes)):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            shape, dtype = leaf.shape, leaf.dtype
            if name in ("bias", "dwconv_bias", "depthwise_bias"):
                arr = jnp.zeros(shape, dtype)
            elif name == "scale":
                arr = jnp.ones(shape, dtype)
            elif name in ("modulator", "cross_modulator"):
                arr = jax.random.normal(keys[i], shape, dtype)
            else:
                arr = jax.random.truncated_normal(
                    keys[i], -2.0, 2.0, shape, jnp.float32
                ).astype(dtype) * 0.02
            leaves.append(arr)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return jax.jit(fill)(rng)


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def cast_weights(params, dtype=jnp.bfloat16):
    """Pre-cast every >=2-D weight leaf to `dtype` for inference serving.

    Modules built with `dtype=bfloat16` cast these leaves on EVERY
    forward (flax promotes kernels to the module dtype; the fused
    kernels do the same for the stacked stage weights) — on a 50M-param
    Uformer_B that re-converts ~100 MB per call. Casting once here makes
    every in-graph `astype` a no-op with bit-identical results.

    1-D leaves (biases, LayerNorm scales) and the relative-position bias
    tables stay fp32: the Pallas kernels consume them in fp32, so casting
    them would *change* numerics, not just pre-pay a conversion.
    """
    def leaf(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if (x.ndim >= 2 and jnp.issubdtype(x.dtype, jnp.floating)
                and "relative_position" not in name):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map_with_path(leaf, params)
