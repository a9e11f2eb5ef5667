"""Per-task inference throughput on the real TPU, scan methodology.

Measures forecasts/sec/chip for every benchmark task's model at reference
dims (512-dim CrossAttnRNN family, 32/64 GTM family, ResNet-101 @299 bf16),
using the same sound methodology as bench.py: one jitted lax.scan over
FULLY DISTINCT per-step batches (every field varies per step, so no encoder
is loop-invariant/hoistable), fetch barrier, the relay's ~28 ms dispatch
round trip amortized over the scan AND subtracted — see perf_roofline.py.
Writes docs/bench_all_models.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from __graft_entry__ import _synthetic_batch
from visuelle2_tpu.eval.profiler import compiled_flops
from visuelle2_tpu.models import VocabSizes, build

VOCAB = VocabSizes(5, 6, 5, 126)
BATCH, ITERS, IMAGE = 128, 40, 299


def stfore_batch(n, w, h, seed=0):
    rng = np.random.default_rng(seed)
    b = _synthetic_batch(n, IMAGE, seed)
    del b["ts"]
    b["X"] = rng.random((n, w, 2)).astype(np.float32)
    b["y"] = rng.random((n, w, h)).astype(np.float32)
    return b


CONFIGS = {
    # (builder kwargs, batch factory) — window counts: H=1 -> 10, H=10 -> 1.
    "cross_attn_rnn_21": (dict(out_len=1), lambda s: stfore_batch(BATCH, 10, 1, s)),
    "cross_attn_rnn_210": (dict(out_len=10, use_teacher_forcing=False),
                           lambda s: stfore_batch(BATCH, 1, 10, s)),
    "cross_attn_rnn_demand": (dict(out_len=12, use_teacher_forcing=False),
                              lambda s: _synthetic_batch(BATCH, IMAGE, s)),
    "gtm": (dict(output_len=12), lambda s: _synthetic_batch(BATCH, IMAGE, s)),
    "m4ft": (dict(output_len=12), lambda s: _synthetic_batch(BATCH, IMAGE, s)),
    # gated_v2 exercises the head-specific/pure gated attention paths at
    # production dims on hardware (Mosaic/XLA compile regression coverage).
    "gated_v2": (dict(output_len=12), lambda s: _synthetic_batch(BATCH, IMAGE, s)),
    "gated_v4": (dict(output_len=12), lambda s: _synthetic_batch(BATCH, IMAGE, s)),
}


def _rt_floor():
    noop = jax.jit(lambda x: x + 1.0)
    d0 = jax.device_put(np.float32(0.0))
    np.asarray(noop(d0))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(noop(d0))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: tiny backbone/shapes, validates "
                         "every code path without TPU hardware (no JSON)")
    opts = ap.parse_args()
    global BATCH, ITERS, IMAGE
    arch = "resnet101"
    if opts.tiny:
        jax.config.update("jax_platforms", "cpu")
        BATCH, ITERS, IMAGE, arch = 4, 3, 64, "tiny"

    results = {}
    rt = _rt_floor()
    for name, (kw, make_batch) in CONFIGS.items():
        model = build(name, vocab=VOCAB, image_arch=arch,
                      image_dtype=jnp.bfloat16, **kw)
        batch = make_batch(0)
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batch, train=False)

        @jax.jit
        def scan_batches(variables, batch_stack):
            def body(_, batch_t):
                f, _aux = model.apply(variables, batch_t, train=False)
                return 0, f
            _, fs = jax.lax.scan(body, 0, batch_stack)
            return fs

        @jax.jit
        def single(variables, batch):
            return model.apply(variables, batch, train=False)[0]

        def mk(seed0):
            steps = [make_batch(seed0 + i) for i in range(ITERS)]
            return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *steps)

        variables = jax.device_put(variables)
        batch = jax.device_put(batch)
        d_warm = jax.device_put(mk(1_000))
        d_timed = jax.device_put(mk(2_000))
        gflops = compiled_flops(single, variables, batch)
        np.asarray(scan_batches(variables, d_warm))
        t0 = time.perf_counter()
        np.asarray(scan_batches(variables, d_timed))
        dt = (time.perf_counter() - t0 - rt) / ITERS
        fps = BATCH / dt
        results[name] = {
            "ms_per_batch": round(dt * 1e3, 1),
            "forecasts_per_sec_per_chip": round(fps, 1),
            "gflops_per_sample": round(gflops / BATCH / 1e9, 2) if gflops else None,
            "tflops_per_sec": round(gflops / dt / 1e12, 1) if gflops else None,
        }
        print(name, results[name], flush=True)
        # Free device memory between models.
        del d_warm, d_timed, variables, batch

    if not opts.tiny:  # smoke numbers are not a record
        with open(os.path.join(REPO, "docs", "bench_all_models.json"), "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
