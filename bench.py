"""Benchmark: flagship demand-forecast inference throughput on TPU.

Measures forecasts/sec/chip for the Gated-v4 demand model (the reference's
north-star config: ResNet-101 image branch at 299x299, 52-week trend
transformer, text/temporal fusion, 12-week forecast) on the full end-to-end
compiled path — uint8 images in, normalize fused on device, bfloat16
backbone.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measurement methodology (each rule verified empirically on this harness —
violating any of them reports physically impossible numbers):

* the axon relay dedupes identical dispatches → the timed call uses inputs
  distinct from warmup;
* independent dispatches overlap beyond one chip's FLOP rate and
  block_until_ready can return early → the whole measurement is ONE dispatch:
  a ``lax.scan`` over a stack of FULLY DISTINCT batches (every field varies
  per step, not just images), so iterations serialize on device, no encoder
  can be hoisted as loop-invariant, and the final ``np.asarray`` fetch is
  the completion barrier;
* cross-checked against XLA cost analysis (28.18 GFLOPs/sample): the
  reported number corresponds to ~110 TFLOP/s sustained bf16 on v5e — sane.

``vs_baseline`` compares against BASELINE_MEASURED.json (GPU-class estimate,
falling back to the measured torch-CPU equivalent — the container ships no
GPU and no torchvision/lightning/fairseq; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BATCH = 128
IMAGE = 299
# The axon relay's dispatch+fetch round trip measures ~28 ms (see
# scripts/perf_roofline.py _roundtrip_floor).  At ~33 ms/batch a 10-step
# scan paid that floor as ~9% phantom per-batch time; 50 steps amortize it
# below 2%, and the floor is additionally measured and subtracted.
ITERS = 50


def _rt_once(noop, d0):
    t0 = time.perf_counter()
    np.asarray(noop(d0))
    return time.perf_counter() - t0


def main():
    # Smoke mode (VIS2_BENCH_SMOKE=1): run the identical measurement logic
    # on CPU with a tiny model/batch — validates the harness end-to-end
    # without claiming the TPU tunnel.  Never used for recorded numbers.
    smoke = os.environ.get("VIS2_BENCH_SMOKE") == "1"

    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from visuelle2_tpu.models import VocabSizes, build

    global BATCH, IMAGE, ITERS
    if smoke:
        BATCH, IMAGE, ITERS = 8, 32, 3
        model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126),
                      output_len=12, image_arch="tiny", embedding_dim=16,
                      hidden_dim=16, image_dtype=jnp.bfloat16)
    else:
        model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126),
                      output_len=12, image_arch="resnet101",
                      image_dtype=jnp.bfloat16)
    batch = _synthetic_batch(BATCH, IMAGE, seed=1)
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

    def _stack(seed0):
        # EVERY batch field is distinct per scan step (not just the images):
        # nothing is loop-invariant, so XLA cannot hoist any encoder out of
        # the timed scan (CLAUDE.md benchmark-integrity rules).
        steps = [_synthetic_batch(BATCH, IMAGE, seed=seed0 + i)
                 for i in range(ITERS)]
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *steps)

    variables = jax.device_put(variables)
    d_warm = jax.device_put(_stack(100))
    d_timed = jax.device_put(_stack(200))
    np.asarray(scan_batches(variables, d_warm))  # compile + warmup

    # Measured dispatch+fetch round-trip floor of this session, subtracted
    # from the single timed dispatch below.
    noop = jax.jit(lambda x: x + 1.0)
    d0 = jax.device_put(np.float32(0.0))
    np.asarray(noop(d0))
    rt = min(_rt_once(noop, d0) for _ in range(5))

    t0 = time.perf_counter()
    np.asarray(scan_batches(variables, d_timed))
    dt = (time.perf_counter() - t0 - rt) / ITERS
    n_chips = max(1, len(jax.devices()))
    fps_chip = BATCH / dt / n_chips

    baseline = 0.0
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    if os.path.isfile(path):
        with open(path) as fh:
            rec = json.load(fh)
        baseline = float(rec.get("gpu_estimate_forecasts_per_sec", 0.0)) or \
            float(rec.get("torch_cpu_forecasts_per_sec", 0.0))

    print(json.dumps({
        "metric": "demand_forecasts_per_sec_per_chip",
        "value": round(fps_chip, 2),
        "unit": "forecasts/s/chip",
        "vs_baseline": round(fps_chip / baseline, 2) if baseline else 0.0,
    }))


if __name__ == "__main__":
    main()
