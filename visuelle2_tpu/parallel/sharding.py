"""Parameter sharding rules (tensor parallelism over the ``model`` axis).

Greenfield relative to the reference (it has no parallelism, SURVEY.md §2.4).
Rule: any kernel with ndim >= 2 (Dense matrices, conv kernels, attention
DenseGenerals, embedding tables) whose TRAILING dim is wide enough
(``min_shard_dim``) and divisible by the model axis shards that dim — column
parallel for matmuls, output-channel parallel for convs, feature parallel
for embeddings.  Everything else (biases, norm scales, narrow kernels)
replicates.  XLA inserts the all-gathers/reduce-scatters over ICI — no
explicit collectives in model code.

Exception: GRU *recurrence* kernels (``w_h``/``w_i`` inside a cell's scan)
always replicate.  Their trailing dim is the fused 3H gate stack, so a
column split cuts ACROSS gate boundaries and the hidden state that feeds
the next scan step comes out gate-fragmented — measured on the compiled
HLO: XLA reshards it with an all-gather + a collective-permute pair INSIDE
the scan body, i.e. per-timestep latency-bound ICI traffic on a [H, 3H]
matmul far too small to amortize it (and a deadlock-prone collective storm
on the virtual CPU mesh).  A 512-wide GRU kernel is ~1.5 MB — replication
is free; the wide feed-forward kernels around the scan still shard.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaf names of ops/gru.py's GRUCell parameters (fused torch-layout gates).
_RECURRENCE_LEAVES = frozenset({"w_i", "w_h"})


def infer_param_sharding(variables, mesh: Mesh, min_shard_dim: int = 64):
    """Pytree of NamedShardings for a variables dict."""
    model_size = mesh.shape["model"]

    def rule(path, leaf):
        if model_size > 1 and hasattr(leaf, "ndim") and leaf.ndim >= 2:
            last_key = path[-1].key if hasattr(path[-1], "key") else None
            if last_key in _RECURRENCE_LEAVES:
                return NamedSharding(mesh, P())
            last = leaf.shape[-1]
            if last >= min_shard_dim and last % model_size == 0:
                spec = [None] * (leaf.ndim - 1) + ["model"]
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, variables)


def shard_variables(variables, mesh: Mesh):
    """Place a variables pytree on the mesh per the inference rule."""
    shardings = infer_param_sharding(variables, mesh)
    return jax.tree_util.tree_map(jax.device_put, variables, shardings)
