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

    # classify leaves up front; random leaves are filled by slicing ONE
    # flat draw per distribution family. The per-leaf version (a
    # truncated_normal subgraph for each of the ~500 leaves) took XLA:CPU
    # minutes to compile on small hosts — one draw + static slices
    # compiles in seconds and runs faster too.
    kinds, sizes = [], []
    for path, leaf in zip(paths, leaf_shapes):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("bias", "dwconv_bias", "depthwise_bias"):
            kinds.append("zeros")
        elif name == "scale":
            kinds.append("ones")
        elif name in ("modulator", "cross_modulator"):
            kinds.append("normal")
        else:
            kinds.append("tn")
        sizes.append(int(np.prod(leaf.shape)) if leaf.shape else 1)
    tn_total = sum(s for k, s in zip(kinds, sizes) if k == "tn")
    nm_total = sum(s for k, s in zip(kinds, sizes) if k == "normal")

    def fill(key):
        k_tn, k_nm = jax.random.split(key)
        flat_tn = jax.random.truncated_normal(
            k_tn, -2.0, 2.0, (max(tn_total, 1),), jnp.float32) * 0.02
        flat_nm = (jax.random.normal(k_nm, (nm_total,), jnp.float32)
                   if nm_total else None)
        off_tn = off_nm = 0
        leaves = []
        for kind, size, leaf in zip(kinds, sizes, leaf_shapes):
            shape, dtype = leaf.shape, leaf.dtype
            if kind == "zeros":
                leaves.append(jnp.zeros(shape, dtype))
            elif kind == "ones":
                leaves.append(jnp.ones(shape, dtype))
            elif kind == "normal":
                leaves.append(flat_nm[off_nm:off_nm + size]
                              .reshape(shape).astype(dtype))
                off_nm += size
            else:
                leaves.append(flat_tn[off_tn:off_tn + size]
                              .reshape(shape).astype(dtype))
                off_tn += size
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
