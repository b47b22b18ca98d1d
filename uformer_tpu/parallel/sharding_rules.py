"""GSPMD sharding rules for Uformer parameter trees.

Default layout: replicate everything (DP); optionally shard the widest
Dense kernels over the 'model' mesh axis (Megatron-style: first FFN/QKV
projection column-sharded, second projection row-sharded) — XLA inserts
the matching collectives. Useful mainly to prove out the 'model' axis;
Uformer-scale models run fastest fully replicated.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# kernel param names that are column-sharded (in, out) -> (None, 'model')
_COL_SHARDED_PARENTS = ("fc1", "linear1", "to_q", "to_kv")
# kernel param names that are row-sharded (in, out) -> ('model', None)
_ROW_SHARDED_PARENTS = ("fc2", "linear2", "proj")


def param_shardings(mesh: Mesh, params):
    """Return a tree of NamedShardings matching `params`."""
    model_size = mesh.shape.get("model", 1)

    def rule(path, leaf):
        if model_size > 1 and leaf.ndim == 2:
            names = [p.key for p in path if hasattr(p, "key")]
            if len(names) >= 2 and names[-1] == "kernel":
                parent = names[-2]
                if parent in _COL_SHARDED_PARENTS and \
                        leaf.shape[1] % model_size == 0:
                    return NamedSharding(mesh, P(None, "model"))
                if parent in _ROW_SHARDED_PARENTS and \
                        leaf.shape[0] % model_size == 0:
                    return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
