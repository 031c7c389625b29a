"""Device mesh construction for (data, model) SPMD layouts.

Axes: "data" shards utterance/window batches (DP); "model" shards
attention heads / MLP hidden dims (TP) where a model exceeds one chip's
HBM. Collectives ride ICI within a slice; host-level file dispatch (DCN)
lives in parallel/batch_driver.py.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    model_parallel: int = 1,
    data_parallel: int = -1,
    devices: list | None = None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model_parallel <= 0:
        model_parallel = 1
    if data_parallel <= 0:
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (
        f"mesh {data_parallel}x{model_parallel} != {n} devices"
    )
    dev_array = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
