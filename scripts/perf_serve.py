"""Serving-artifact throughput vs the live model on the real TPU.

Exports gated_v4 at production dims (ResNet-101 @299 bf16, batch 128) to a
StableHLO artifact (eval/export.py), reloads it, and times both paths with
the relay-safe methodology (one jitted lax.scan over DISTINCT per-step image
batches, host fetch as the barrier; CLAUDE.md "Benchmark integrity").
``exported.call`` is traceable, so the artifact runs under the same scan.

Expected: parity — the artifact is the same XLA program with weights as
constants.
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
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from visuelle2_tpu.eval.export import export_forecaster, load_forecaster
    from visuelle2_tpu.models import VocabSizes, build

    model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126), output_len=12,
                  image_arch="resnet101", image_dtype=jnp.bfloat16)
    batch = _synthetic_batch(BATCH, IMAGE, seed=1)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)

    path = "/tmp/perf_serve_gated_v4.v2tpu"
    if os.path.exists(path) and "--reuse" in sys.argv:
        print(json.dumps({"artifact_mb": round(os.path.getsize(path) / 1e6, 1),
                          "reused": True}), flush=True)
    else:
        t0 = time.perf_counter()
        size = export_forecaster(model, variables, batch, path)
        print(json.dumps({"export_s": round(time.perf_counter() - t0, 1),
                          "artifact_mb": round(size / 1e6, 1)}), flush=True)
    _fn, header = load_forecaster(path)
    keys = header["keys"]
    base = {k: jax.device_put(v) for k, v in batch.items() if k != "images"}

    def time_scan(apply_images):
        rng = np.random.default_rng(7)
        stacks = [rng.integers(0, 255, (ITERS, BATCH, IMAGE, IMAGE, 3))
                  .astype(np.uint8) for _ in range(2)]

        @jax.jit
        def scan_batches(image_stack):
            def body(_, images_t):
                return 0, apply_images(images_t)
            _, fs = jax.lax.scan(body, 0, image_stack)
            return fs

        warm, timed = (jax.device_put(s) for s in stacks)
        np.asarray(scan_batches(warm))
        t0 = time.perf_counter()
        np.asarray(scan_batches(timed))
        return (time.perf_counter() - t0) / ITERS

    from jax import export as jax_export

    with open(path, "rb") as f:
        f.read(12)
        n = int.from_bytes(f.read(8), "little")
        f.read(n)
        exported = jax_export.deserialize(f.read())

    def live(images_t):
        f, _aux = model.apply(variables, dict(base, images=images_t),
                              train=False)
        return f

    def artifact(images_t):
        feed = dict(base, images=images_t)
        return exported.call(*(feed[k] for k in keys))

    dt_live = time_scan(live)
    dt_art = time_scan(artifact)
    print(json.dumps({
        "live_forecasts_per_sec_per_chip": round(BATCH / dt_live, 1),
        "artifact_forecasts_per_sec_per_chip": round(BATCH / dt_art, 1),
        "artifact_vs_live": round(dt_live / dt_art, 3),
    }))


if __name__ == "__main__":
    main()
