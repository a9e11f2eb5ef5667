"""Serving export: a trained forecaster as one self-contained artifact.

The reference has no deployment story — serving it means dragging the whole
training repo plus torch/lightning/torchvision into production.  Here a
trained model exports to a single StableHLO artifact via ``jax.export``:
weights are baked in as constants, the input signature is the standard batch
dict (uint8 images in, forecasts out), and the artifact reloads and executes
with nothing but jax installed — on TPU, CPU, or GPU, independent of this
package's model code.  Rescaling by the norm scalar and metric computation
stay downstream (``forecast_dl.py:176-198`` semantics), so the artifact's
outputs are the model-space forecasts.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Tuple

import jax
import numpy as np
from jax import export as jax_export

# Artifact layout: 12-byte magic, 8-byte little-endian JSON-header length,
# the JSON header (batch-key order, shapes/dtypes, version), then the
# serialized StableHLO module.
_MAGIC = b"V2TPUEXPORT1"


def _quantize_variables(variables, min_size: int = 4096):
    """Weight-only per-channel int8 for the artifact's baked constants.

    Float arrays with >=2 dims and >= ``min_size`` elements (conv/dense
    kernels, embedding tables) are stored as int8 plus a per-output-channel
    float32 scale and dequantized to their original dtype inside the
    exported function — so the serialized module carries 1-byte weights
    (~4x smaller artifact vs f32) while every matmul/conv still runs in the
    model's float dtype (accuracy-bounded: max per-channel rounding error is
    scale/2).  Biases, norm parameters, and small tables stay exact.

    Returns ``(materialize, n_quantized)`` where ``materialize()`` rebuilds
    the variables pytree for tracing.
    """
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    packed, n_q = [], 0
    for leaf in leaves:
        a = np.asarray(leaf)
        is_float = jax.numpy.issubdtype(
            jax.numpy.asarray(leaf).dtype, jax.numpy.floating)
        if a.ndim >= 2 and a.size >= min_size and is_float:
            a32 = a.astype(np.float32)
            scale = np.max(np.abs(a32), axis=tuple(range(a.ndim - 1)),
                           keepdims=True) / 127.0
            scale = np.where(scale == 0.0, 1.0, scale).astype(np.float32)
            q = np.clip(np.round(a32 / scale), -127, 127).astype(np.int8)
            packed.append(("q", jax.numpy.asarray(q),
                           jax.numpy.asarray(scale), leaf.dtype))
            n_q += 1
        else:
            packed.append(("f", leaf, None, None))

    def materialize():
        out = [(x.astype(jax.numpy.float32) * s).astype(dt)
               if tag == "q" else x for tag, x, s, dt in packed]
        return jax.tree_util.tree_unflatten(treedef, out)

    return materialize, n_q


def export_forecaster(model, variables, example_batch: Dict[str, np.ndarray],
                      path: str, platforms=("cpu", "tpu"),
                      quantize: str = None,
                      quantize_min_size: int = 4096,
                      extra_header: Dict = None,
                      apply_fn=None) -> int:
    """Serialize ``model.apply(variables, batch, train=False)`` to ``path``.

    Weights are closed over (baked into the module); the exported callable
    takes the batch dict's arrays in sorted-key order.  The module is lowered
    for every platform in ``platforms`` so one artifact serves TPU fleets and
    CPU canaries alike.  ``quantize="int8"`` stores the large weight
    constants as weight-only per-channel int8 (see ``_quantize_variables``)
    for a ~4x smaller artifact.  ``quantize="w8a8"`` additionally requires
    ``apply_fn`` — a calibrated ``quantized_apply_fn`` from
    ``models/quantized_resnet.py`` — and bakes the int8-runtime backbone
    into the artifact (int8 weight storage composes losslessly: the runtime
    re-quantization of a dequantized per-channel-int8 kernel recovers the
    same int8 values).  ``apply_fn`` alone swaps the traced execution path
    without changing weight storage.  Returns the artifact size in bytes.
    """
    keys = sorted(example_batch.keys())
    if quantize not in (None, "", "none", "int8", "w8a8"):
        raise ValueError(f"unsupported quantize mode {quantize!r}")
    if quantize == "w8a8" and apply_fn is None:
        raise ValueError(
            "quantize='w8a8' needs a calibrated apply_fn "
            "(models/quantized_resnet.quantized_apply_fn)")
    n_q = 0
    if quantize in ("int8", "w8a8"):
        materialize, n_q = _quantize_variables(variables, quantize_min_size)
    else:
        materialize = lambda: variables
    apply_fn = apply_fn if apply_fn is not None else model.apply

    def forecast(*arrays):
        batch = dict(zip(keys, arrays))
        out, _aux = apply_fn(materialize(), batch, train=False)
        return out

    args = tuple(jax.numpy.asarray(example_batch[k]) for k in keys)
    exported = jax_export.export(jax.jit(forecast),
                                 platforms=list(platforms))(*args)
    blob = exported.serialize()
    header = json.dumps({
        "keys": keys, "version": 1,
        "shapes": {k: list(np.shape(example_batch[k])) for k in keys},
        "dtypes": {k: str(np.asarray(example_batch[k]).dtype) for k in keys},
        **({"quantize": quantize, "quantized_arrays": n_q}
           if quantize in ("int8", "w8a8") else {}),
        # Provenance (model name, gtm_v1 text-featurizer fingerprint, ...):
        # informational for clients via /health; never consulted by load.
        **({"provenance": extra_header} if extra_header else {}),
    }).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(blob)
    return os.path.getsize(path)


def load_forecaster(path: str) -> Tuple[Callable[[Dict[str, np.ndarray]], jax.Array], dict]:
    """Load an exported artifact; returns ``(forecast_fn, header)``.

    ``forecast_fn`` takes the same batch dict the model was exported with
    (shapes/dtypes must match — serving batches are padded to the export
    batch size, exactly like the training loader pads its tail batch).
    """
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:  # real raises: this is the production serving
            raise ValueError(f"not a visuelle2_tpu export: {path}")
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n).decode())
        blob = f.read()
    exported = jax_export.deserialize(blob)
    keys = header["keys"]

    def forecast_fn(batch: Dict[str, np.ndarray]) -> jax.Array:
        # Validation with real exceptions (asserts vanish under python -O,
        # and this is the production serving path): a mismatch must give
        # the per-key reason, not a low-level XLA signature error.
        missing = set(keys) - set(batch)
        if missing:
            raise ValueError(f"batch missing keys: {sorted(missing)}")
        for k, want in header.get("shapes", {}).items():
            got = list(np.shape(batch[k]))
            if got != want:
                raise ValueError(
                    f"batch['{k}'] shape {got} != exported {want} — serving "
                    f"batches must match the export batch/slot sizes")
        for k, want_dt in header.get("dtypes", {}).items():
            got_dt = np.asarray(batch[k]).dtype
            if got_dt != np.dtype(want_dt):
                raise ValueError(
                    f"batch['{k}'] dtype {got_dt} != exported {want_dt}")
        return exported.call(*(batch[k] for k in keys))

    return forecast_fn, header
