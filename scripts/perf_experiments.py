"""Perf experiments for the flagship bench (VERDICT r1 item 5).

Sweeps batch size / pallas flag on the real TPU with the same relay-safe
scan-over-distinct-inputs methodology as bench.py, printing one JSON line
per config.  Keep ITERS moderate: each config stacks ITERS distinct image
batches in HBM.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(batch_size, image=299, iters=6, use_pallas=False):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from visuelle2_tpu.models import VocabSizes, build

    model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126), output_len=12,
                  image_arch="resnet101", image_dtype=jnp.bfloat16,
                  use_pallas=use_pallas)
    batch = _synthetic_batch(batch_size, image, seed=1)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)

    @jax.jit
    def scan_batches(variables, batch, image_stack):
        def body(_, images_t):
            f, _aux = model.apply(variables, dict(batch, images=images_t),
                                  train=False)
            return 0, f
        _, fs = jax.lax.scan(body, 0, image_stack)
        return fs

    rng = np.random.default_rng(7)
    warm = rng.integers(0, 255, (iters, batch_size, image, image, 3)).astype(np.uint8)
    timed = rng.integers(0, 255, (iters, batch_size, image, image, 3)).astype(np.uint8)
    variables = jax.device_put(variables)
    batch = jax.device_put(batch)
    d_warm, d_timed = jax.device_put(warm), jax.device_put(timed)
    np.asarray(scan_batches(variables, batch, d_warm))
    t0 = time.perf_counter()
    np.asarray(scan_batches(variables, batch, d_timed))
    dt = (time.perf_counter() - t0) / iters
    fps = batch_size / dt / max(1, len(jax.devices()))
    lowered = scan_batches.lower(variables, batch, d_timed).compile()
    cost = lowered.cost_analysis()
    # XLA cost_analysis counts a lax.scan body ONCE (not x trip count), so
    # the program flops already equal one iteration's flops.
    flops = (cost or {}).get("flops", float("nan"))
    print(json.dumps({
        "batch": batch_size, "pallas": use_pallas,
        "fps_chip": round(fps, 1),
        "gflops_sample": round(flops / batch_size / 1e9, 2)
        if np.isfinite(flops) else None,
        "tflops_sustained": round(fps * flops / batch_size / 1e12, 1)
        if np.isfinite(flops) else None,
    }), flush=True)
    return fps


if __name__ == "__main__":
    import sys

    configs = sys.argv[1:] or ["128", "256", "512"]
    for c in configs:
        use_pallas = c.endswith("p")
        bs = int(c.rstrip("p"))
        measure(bs, use_pallas=use_pallas)
