"""Model complexity reporting.

Replaces the reference's hand-maintained per-module `flops()` methods
(`/root/reference/model.py:49-58,527-546,1307-1328`) with the XLA
compiler's own cost model: exact FLOPs/bytes for the compiled program,
which also captures fusion instead of double-counting it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from uformer_tpu.utils.params import count_params


def model_complexity(model, input_shape=(1, 256, 256, 3)):
    """Returns dict(params_m, gflops, bytes_gb) for one forward pass."""
    x = jnp.zeros(input_shape, jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda l: jnp.zeros(l.shape, l.dtype), shapes)
    compiled = jax.jit(lambda p, x: model.apply(p, x)).lower(params, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {
        "params_m": count_params(params) / 1e6,
        "gflops": ca.get("flops", 0.0) / 1e9,
        "bytes_gb": ca.get("bytes accessed", 0.0) / 1e9,
    }
