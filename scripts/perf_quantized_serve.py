"""int8 weight-only artifact vs full-precision artifact on the real TPU.

Answers the two production questions about ``--quantize int8``
(eval/export.py) at the flagship serving config (gated_v4, ResNet-101
@299, bf16 backbone, batch 128):

1. artifact bytes — weights dominate, so expect ~4x smaller vs f32
   constants (bf16 backbones ~2x);
2. serving throughput — the dequant (int8 -> float * scale) is folded by
   XLA at compile time when weights are constants; this measures whether
   that actually happens on the TPU relay (a non-folded dequant would tax
   every step with extra HBM traffic).

Methodology matches bench.py (CLAUDE.md "Benchmark integrity"): each
artifact is timed as ONE jitted ``lax.scan`` whose every batch field is
distinct per step (nothing loop-invariant, nothing hoistable), with a host
fetch as the completion barrier, the measured dispatch+fetch round-trip
floor subtracted, and warmup inputs distinct from timed inputs.  Both
artifacts share the same timed input stack, so the reported ratio is
floor- and input-insensitive.

    python scripts/perf_quantized_serve.py [--reuse]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
IMAGE = 299
ITERS = 30


def _load_exported(path):
    from jax import export as jax_export

    with open(path, "rb") as f:
        f.read(12)
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n).decode())
        return jax_export.deserialize(f.read()), header


def main():
    import jax

    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from visuelle2_tpu.eval.export import export_forecaster
    from visuelle2_tpu.models import VocabSizes, build

    model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126), output_len=12,
                  image_arch="resnet101", image_dtype=jnp.bfloat16)
    batch = _synthetic_batch(BATCH, IMAGE, seed=1)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)

    paths = {"full": "/tmp/perf_q_full.v2tpu", "int8": "/tmp/perf_q_int8.v2tpu"}
    sizes = {}
    for mode, path in paths.items():
        if not (os.path.exists(path) and "--reuse" in sys.argv):
            export_forecaster(model, variables, batch, path,
                              quantize=None if mode == "full" else "int8")
        sizes[mode] = os.path.getsize(path)

    keys = sorted(batch.keys())

    def _stack(seed0):
        steps = [_synthetic_batch(BATCH, IMAGE, seed=seed0 + i)
                 for i in range(ITERS)]
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *steps)

    d_warm = jax.device_put(_stack(100))
    d_timed = jax.device_put(_stack(200))

    # Measured dispatch+fetch round-trip floor (bench.py methodology).
    noop = jax.jit(lambda x: x + 1.0)
    d0 = jax.device_put(np.float32(0.0))
    np.asarray(noop(d0))

    def _rt_once():
        t0 = time.perf_counter()
        np.asarray(noop(d0))
        return time.perf_counter() - t0

    rt = min(_rt_once() for _ in range(5))

    def time_scan(exported):
        @jax.jit
        def scan_batches(stack):
            def body(_, feed_t):
                return 0, exported.call(*(feed_t[k] for k in keys))
            _, fs = jax.lax.scan(body, 0, stack)
            return fs

        np.asarray(scan_batches(d_warm))  # compile + warmup
        t0 = time.perf_counter()
        np.asarray(scan_batches(d_timed))
        return (time.perf_counter() - t0 - rt) / ITERS

    full, _ = _load_exported(paths["full"])
    quant, qh = _load_exported(paths["int8"])
    dt_full = time_scan(full)
    dt_int8 = time_scan(quant)

    print(json.dumps({
        "artifact_mb_full": round(sizes["full"] / 1e6, 1),
        "artifact_mb_int8": round(sizes["int8"] / 1e6, 1),
        "size_ratio": round(sizes["full"] / sizes["int8"], 2),
        "quantized_arrays": qh.get("quantized_arrays"),
        "full_forecasts_per_sec_per_chip": round(BATCH / dt_full, 1),
        "int8_forecasts_per_sec_per_chip": round(BATCH / dt_int8, 1),
        "int8_vs_full": round(dt_full / dt_int8, 3),
    }))


if __name__ == "__main__":
    main()
