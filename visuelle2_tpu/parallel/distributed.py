"""Multi-process (multi-host) initialization and hybrid DCN meshes.

The reference has no distributed backend at all (SURVEY.md §2.4); this module
is the greenfield scale-out path.  Topology model:

* ``dcn``   — the process (host/slice) axis; gradient all-reduce crosses it.
* ``data``  — within-process batch parallelism over ICI.
* ``model`` — optional tensor parallelism (innermost so TP collectives stay
  on the fastest links and never cross DCN).

Batches are fed *process-locally*: each process materializes only its own
rows and :func:`global_batch` assembles the logical global array via
``jax.make_array_from_process_local_data`` — no host ever holds the full
batch.  On real TPU pods ``initialize()`` defers to JAX's automatic
coordinator discovery; on CPU (tests, this container) it forces the host
platform with N virtual devices per process and gloo collectives, giving a
faithful multi-controller simulation of a multi-slice deployment.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               cpu_devices_per_process: Optional[int] = None) -> None:
    """Join the multi-process runtime.  Must run before any backend touch.

    With no arguments this is TPU-pod autodiscovery
    (``jax.distributed.initialize()``).  With explicit coordinates it also
    supports the CPU simulation path: ``cpu_devices_per_process`` forces the
    host platform with that many virtual devices and selects gloo for
    cross-process collectives (the same config-based switch as
    tests/conftest.py — env mutation is too late under sitecustomize).
    """
    if cpu_devices_per_process:
        import re

        flags = os.environ.get("XLA_FLAGS", "")
        want = f"--xla_force_host_platform_device_count={cpu_devices_per_process}"
        m = re.search(r"xla_force_host_platform_device_count=(\d+)", flags)
        if m is None:
            os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
        elif int(m.group(1)) != cpu_devices_per_process:
            # The flag in the environment would silently win over the
            # requested count and build a different-sized topology.
            raise ValueError(
                f"XLA_FLAGS already forces {m.group(1)} host devices but "
                f"cpu_devices_per_process={cpu_devices_per_process} was "
                f"requested — unset the flag or pass a matching count")

    import jax

    if cpu_devices_per_process:
        if jax.config.jax_platforms != "cpu":
            jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_hybrid_mesh(model: int = 1, devices: Optional[Sequence] = None):
    """``(dcn, data, model)`` mesh: process axis outermost, TP innermost.

    The device array is laid out process-major so the ``dcn`` axis exactly
    follows process boundaries — verified by assertion, since batch feeding
    (:func:`global_batch`) relies on each process owning a contiguous row
    block of the batch axis.
    """
    import jax
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    nproc = jax.process_count()
    per = len(devices) // nproc
    # Real raises, not asserts (python -O strips them): a wrong topology
    # here silently breaks global_batch's contiguous-row-block contract.
    if per * nproc != len(devices) or per % model != 0:
        raise ValueError(
            f"{len(devices)} devices / {nproc} processes not divisible by "
            f"model={model}")
    arr = np.asarray(devices).reshape(nproc, per // model, model)
    for p in range(nproc):
        if not all(d.process_index == arr[p].flat[0].process_index
                   for d in arr[p].flat):
            raise ValueError("devices not process-major: the dcn axis would "
                             "cross process boundaries")
    return Mesh(arr, axis_names=("dcn", "data", "model"))


def global_batch(batch, sharding):
    """Assemble a logically-global batch from this process's local rows.

    Single-process this is a plain committed ``device_put``; multi-process
    each array's rows are only this process's shard and the result is a
    distributed ``jax.Array`` with the given sharding.
    """
    import jax

    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)
