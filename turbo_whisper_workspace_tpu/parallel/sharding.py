"""PartitionSpecs for Whisper/Llama parameter pytrees (Megatron-style TP).

Column-parallel into the attention/MLP (q/k/v, fc1 shard the output
feature dim = heads/hidden), row-parallel out of them (out_proj, fc2
shard the input dim) — XLA inserts the psum on the row-parallel products
from these annotations alone; no explicit collectives in model code.
Layer-stacked block params carry a leading (layer) axis that is never
sharded. Everything else (LN, embeddings, convs) is replicated: for
Whisper-sized models the wins are in sharding the per-step matmuls, not
the embedding tables.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# path-suffix → spec builder; `layered` prepends the stacked-layer axis
_COL_W = {"q/w", "k/w", "v/w", "fc1/w", "gate/w", "up/w"}
_COL_B = {"q/b", "k/b", "v/b", "fc1/b", "gate/b", "up/b"}
_ROW_W = {"out/w", "fc2/w", "down/w"}


def _spec_for(path: str, ndim: int) -> P:
    layered = "/blocks/" in path
    suffix = "/".join(path.split("/")[-2:])
    lead = (None,) if layered else ()
    if suffix in _COL_W:
        return P(*lead, None, MODEL_AXIS)
    if suffix in _COL_B:
        return P(*lead, MODEL_AXIS)
    if suffix in _ROW_W:
        return P(*lead, MODEL_AXIS, None)
    return P(*([None] * ndim))


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out[k] = _tree_paths(v, f"{prefix}/{k}")
        return out
    return prefix


def param_specs(params) -> object:
    """Pytree of PartitionSpec mirroring a parameter pytree."""
    paths = _tree_paths(params)
    return jax.tree.map(
        lambda p, x: _spec_for(p, x.ndim), paths, params
    )


def shard_params(params, mesh: Mesh):
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def cache_spec(mesh: Mesh) -> NamedSharding:
    """KV caches (L, B, T, D): batch over data, features over model."""
    from .mesh import DATA_AXIS

    return NamedSharding(mesh, P(None, DATA_AXIS, None, MODEL_AXIS))
