"""Measure unique-image dedup inference throughput on the real TPU.

gated_v4 demand model at production dims (ResNet-101 @299 bf16, batch 128),
sweeping the product-photo duplication factor: a batch of 128 (product,
store) rows covers 128/dup distinct images; the loader ships unique images
plus an img_idx map and every backbone pass is amortized over ``dup`` rows
(data/loader.py dedup_images).  dup=1 reproduces bench.py's headline.

Relay-safe methodology (CLAUDE.md "Benchmark integrity"): one jitted
lax.scan over DISTINCT per-step image stacks, host fetch as the barrier.
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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--dups", type=int, nargs="+", default=[1, 4, 10, 32])
    ap.add_argument("--iters", type=int, default=ITERS)
    opts = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from visuelle2_tpu.models import VocabSizes, build

    BATCH_, ITERS_ = opts.batch, opts.iters
    model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126), output_len=12,
                  image_arch="resnet101", image_dtype=jnp.bfloat16)
    batch = _synthetic_batch(BATCH_, IMAGE, seed=1)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    variables = jax.device_put(variables)
    base = {k: jax.device_put(v) for k, v in batch.items() if k != "images"}

    results = {}
    rng = np.random.default_rng(7)
    for dup in opts.dups:
        slots = -(-BATCH_ // dup)
        img_idx = (np.arange(BATCH_) // dup).astype(np.int32)
        feed = dict(base, img_idx=jax.device_put(img_idx))

        @jax.jit
        def scan_batches(variables, feed, image_stack):
            def body(_, images_t):
                f, _aux = model.apply(
                    variables, dict(feed, images=images_t), train=False)
                return 0, f
            _, fs = jax.lax.scan(body, 0, image_stack)
            return fs

        stack_warm = rng.integers(0, 255, (ITERS_, slots, IMAGE, IMAGE, 3)).astype(np.uint8)
        stack_timed = rng.integers(0, 255, (ITERS_, slots, IMAGE, IMAGE, 3)).astype(np.uint8)
        d_warm, d_timed = jax.device_put(stack_warm), jax.device_put(stack_timed)
        np.asarray(scan_batches(variables, feed, d_warm))
        t0 = time.perf_counter()
        np.asarray(scan_batches(variables, feed, d_timed))
        dt = (time.perf_counter() - t0) / ITERS_
        fps = BATCH_ / dt
        results[f"dup{dup}"] = {
            "slots": slots,
            "ms_per_batch": round(dt * 1e3, 2),
            "forecasts_per_sec_per_chip": round(fps, 1),
        }
        print(json.dumps({f"dup{dup}": results[f"dup{dup}"]}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
