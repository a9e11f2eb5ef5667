"""Device mesh construction and batch sharding.

The reference has no distributed backend at all (SURVEY.md §2.4) — it pins a
single GPU.  The TPU-native design scales through a ``jax.sharding.Mesh``:

* ``data`` axis — batch (items) parallelism; host batches land as per-chip
  shards, loss/metric reductions become ICI ``psum``s inserted by XLA.
* ``model`` axis — optional tensor parallelism for wide Dense/embedding
  kernels (see ``sharding.infer_param_sharding``).

On a v5e-8 slice the default is an 8-way data mesh; ``make_mesh`` also serves
the virtual CPU mesh used by tests and the driver's multi-chip dry-run.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:  # a real raise: python -O strips asserts
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch/items) over every non-model axis.

    On the standard ``(data, model)`` mesh this is ``P('data')``; on a hybrid
    ``(dcn, data, model)`` mesh (parallel/distributed.py) the batch axis
    spans processes × local devices."""
    axes = tuple(ax for ax in mesh.axis_names if ax != "model")
    return NamedSharding(mesh, P(axes))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a [accum_steps, batch, ...] microbatch stack: axis 0
    (the accumulation axis) replicates, axis 1 is the batch axis."""
    axes = tuple(ax for ax in mesh.axis_names if ax != "model")
    return NamedSharding(mesh, P(None, axes))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
