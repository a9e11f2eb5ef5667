"""VERDICT r1 item 7: is the Pallas decode-loop path load-bearing?

Runs CrossAttnRNNDemand (production dims 512, ResNet-101 @299, 12-step
scan decode) on the real TPU with use_pallas off/on: reports throughput for
each and the end-to-end forecast drift.  Relay-safe scan methodology.
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
ITERS = 6


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from visuelle2_tpu.models import VocabSizes, build

    batch = _synthetic_batch(BATCH, IMAGE, seed=1)
    kw = dict(vocab=VocabSizes(5, 6, 5, 126), out_len=12,
              use_teacher_forcing=False, image_arch="resnet101",
              image_dtype=jnp.bfloat16)
    ref = build("cross_attn_rnn_demand", **kw)
    variables = ref.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "sampling": jax.random.key(2)}, batch, train=False)
    variables = jax.device_put(variables)
    batch_d = jax.device_put(batch)

    rng = np.random.default_rng(7)
    stacks = {}
    for name in ("warm", "timed"):
        stacks[name] = jax.device_put(rng.integers(
            0, 255, (ITERS, BATCH, IMAGE, IMAGE, 3)).astype(np.uint8))

    results = {}
    preds = {}
    for use_pallas in (False, True):
        model = build("cross_attn_rnn_demand", use_pallas=use_pallas, **kw)

        @jax.jit
        def scan_b(variables, batch, image_stack, model=model):
            def body(_, images_t):
                f, _aux = model.apply(variables, dict(batch, images=images_t),
                                      train=False)
                return 0, f
            _, fs = jax.lax.scan(body, 0, image_stack)
            return fs

        warm_out = np.asarray(scan_b(variables, batch_d, stacks["warm"]))
        t0 = time.perf_counter()
        out = np.asarray(scan_b(variables, batch_d, stacks["timed"]))
        dt = (time.perf_counter() - t0) / ITERS
        results[use_pallas] = BATCH / dt
        preds[use_pallas] = out

    drift = float(np.max(np.abs(preds[True] - preds[False])))
    rel = drift / max(1e-9, float(np.max(np.abs(preds[False]))))
    print(json.dumps({
        "model": "cross_attn_rnn_demand@512",
        "fps_chip_xla": round(results[False], 1),
        "fps_chip_pallas": round(results[True], 1),
        "speedup": round(results[True] / results[False], 3),
        "max_abs_drift": drift,
        "max_rel_drift": rel,
    }), flush=True)


if __name__ == "__main__":
    main()
