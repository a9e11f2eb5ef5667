"""Dedup throughput regression series — eval AND train, one TPU claim.

The unique-image dedup path (data/loader.py ``dedup_images``) is the
framework's algorithmic win over per-row encoding: it beats the d=1
speed-of-light by the product-photo duplication factor (BASELINE.md "Beyond
speed-of-light").  This script is the guard that keeps it from silently
rotting: it measures gated_v4 at production dims (ResNet-101 @299 bf16,
batch 128) for duplication d ∈ {1, 4, 10} on both the inference and the
full-train-step path, and appends one labelled record to the checked-in
series file (``docs/perf_dedup_series.json``).

Run each round:  python scripts/perf_dedup_series.py --label r3

Relay-safe methodology throughout (CLAUDE.md "Benchmark integrity"): one
jitted ``lax.scan`` per measurement over DISTINCT per-step inputs (train
additionally serializes through the TrainState carry), host fetch as the
completion barrier.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
IMAGE = 299
SERIES_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "perf_dedup_series.json")

_RT = None


def _rt_floor():
    """Relay dispatch+fetch round-trip floor (~28 ms measured); subtracted
    from every timed dispatch so short scans aren't inflated by it (see
    scripts/perf_roofline.py)."""
    global _RT
    if _RT is None:
        import jax

        noop = jax.jit(lambda x: x + 1.0)
        d0 = jax.device_put(np.float32(0.0))
        np.asarray(noop(d0))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(noop(d0))
            ts.append(time.perf_counter() - t0)
        _RT = min(ts)
    return _RT


def _stack_batches(iters, seed0, dup):
    """[iters, ...] stack of FULLY DISTINCT dedup batches: every field varies
    per scan step (not just the images), so XLA cannot hoist the non-image
    encoders out of the timed scan as loop-invariant — the same rule bench.py
    follows (CLAUDE.md benchmark integrity).  At high duplication the image
    backbone is only a fraction of the step, so a hoisted trend/sales/text
    encoder would overstate dedup throughput noticeably."""
    import jax

    from __graft_entry__ import _synthetic_batch

    slots = -(-BATCH // dup)
    img_idx = (np.arange(BATCH) // dup).astype(np.int32)
    steps = []
    for i in range(iters):
        b = dict(_synthetic_batch(BATCH, IMAGE, seed=seed0 + i))
        b["images"] = np.asarray(b["images"])[:slots]
        b["img_idx"] = img_idx
        steps.append(b)
    return slots, jax.tree_util.tree_map(lambda *xs: np.stack(xs), *steps)


def _calibrate_iters(probe_ms, probe_iters, dup, target_s, max_stack_gb):
    """Scan length giving ~``target_s`` of device time per timed dispatch
    (CLAUDE.md: amortize the ~28 ms relay floor over a long-enough scan).
    Capped so the stacked image inputs stay under ``max_stack_gb`` TOTAL:
    the warm and timed stacks are both device-resident, so the per-stack
    budget is half the flag value (keeps the flag's name honest)."""
    slots = -(-BATCH // dup)
    bytes_per_step = slots * IMAGE * IMAGE * 3  # uint8 images dominate
    mem_cap = max(probe_iters,
                  int(max_stack_gb * 2**30 // (2 * bytes_per_step)))
    want = int(target_s * 1e3 / max(probe_ms, 1e-3))
    return max(probe_iters, min(want, mem_cap, 512))


def measure_eval(model, variables, dup, iters, seed0, apply_fn=None):
    import jax

    fn = apply_fn if apply_fn is not None else model.apply

    @jax.jit
    def scan_batches(variables, batch_stack):
        def body(_, batch_t):
            f, _aux = fn(variables, batch_t, train=False)
            return 0, f
        _, fs = jax.lax.scan(body, 0, batch_stack)
        return fs

    slots, warm = _stack_batches(iters, seed0 + 10_000, dup)
    _, timed = _stack_batches(iters, seed0 + 20_000, dup)
    warm, timed = jax.device_put(warm), jax.device_put(timed)
    np.asarray(scan_batches(variables, warm))
    t0 = time.perf_counter()
    np.asarray(scan_batches(variables, timed))
    dt = (time.perf_counter() - t0 - _rt_floor()) / iters
    return {"slots": slots, "ms_per_batch": round(dt * 1e3, 2),
            "forecasts_per_sec_per_chip": round(BATCH / dt, 1)}


def measure_train(model, trainer, dup, iters, seed0):
    import jax

    from visuelle2_tpu.train.loop import expand_mask, mse_loss, target_and_pred

    @jax.jit
    def scan_train(state, batch_stack):
        def body(state, batch_t):
            def loss_fn(params):
                variables = {"params": params,
                             "batch_stats": state.batch_stats}
                (f, _aux), mut = model.apply(
                    variables, batch_t, train=True,
                    rngs={"dropout": jax.random.key(0),
                          "sampling": jax.random.key(1)},
                    mutable=["batch_stats"])
                target, pred = target_and_pred(batch_t, f)
                return mse_loss(target, pred, expand_mask(batch_t, target)), \
                    mut["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            return state.apply_gradients(grads, stats), loss

        return jax.lax.scan(body, state, batch_stack)

    slots, warm = _stack_batches(iters, seed0 + 30_000, dup)
    _, timed = _stack_batches(iters, seed0 + 40_000, dup)
    state = trainer.init_state(
        jax.tree_util.tree_map(lambda x: x[0], warm))
    warm, timed = jax.device_put(warm), jax.device_put(timed)
    state2, losses = scan_train(state, warm)
    np.asarray(losses)
    t0 = time.perf_counter()
    _, losses = scan_train(state2, timed)
    np.asarray(losses)
    dt = (time.perf_counter() - t0 - _rt_floor()) / iters
    return {"slots": slots, "step_ms": round(dt * 1e3, 1),
            "train_samples_per_sec_per_chip": round(BATCH / dt, 1)}


def _measure_with_backoff(measure, min_iters, iters, *args, **kw):
    """Run ``measure`` at the calibrated scan length, halving it on device
    OOM (RESOURCE_EXHAUSTED) until it fits — a too-short scan only costs
    floor-amortization precision (and the floor is subtracted anyway), a
    too-long one kills the whole series run."""
    while True:
        try:
            probe = measure(iters=iters, *args, **kw)
            probe["iters"] = iters
            return probe
        except Exception as e:  # jax.errors.JaxRuntimeError has no stable api
            if "RESOURCE_EXHAUSTED" not in str(e) or iters <= min_iters:
                raise
            iters = max(min_iters, iters // 2)
            print(json.dumps({"oom_backoff_to_iters": iters}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--label", type=str, required=True,
                    help="series label for this record, e.g. r3")
    ap.add_argument("--dups", type=int, nargs="+", default=[1, 4, 10])
    ap.add_argument("--eval_iters", type=int, default=8,
                    help="probe scan length; the timed scan is re-calibrated "
                         "to ~--target_device_s of device time")
    ap.add_argument("--train_iters", type=int, default=4,
                    help="probe scan length for the train measurements")
    ap.add_argument("--target_device_s", type=float, default=1.5)
    # 1.0 GiB per stack (warm + timed both device-resident) measured safe on
    # the relay chip; 1.5 GiB OOM'd at d=10 with ~2 GB of ResNet-101@299
    # activations alive — the usable HBM headroom is smaller than the
    # nominal 16 GB.  _measure_with_backoff halves the scan on OOM anyway.
    ap.add_argument("--max_stack_gb", type=float, default=1.0)
    ap.add_argument("--out", type=str, default=SERIES_PATH)
    ap.add_argument("--w8a8", action="store_true",
                    help="also record the int8 serving engine "
                         "(models/quantized_resnet.py) over the same eval "
                         "series, under an 'eval_w8a8' key — the dedup x "
                         "quantization compound is the serving sweet spot")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: tiny backbone/shapes, validates "
                         "every code path (incl. calibration) without TPU")
    opts = ap.parse_args()

    global BATCH, IMAGE
    if opts.tiny:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
        BATCH, IMAGE = 8, 64

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from visuelle2_tpu.models import VocabSizes, build
    from visuelle2_tpu.train.loop import TrainConfig, Trainer

    model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126), output_len=12,
                  image_arch="tiny" if opts.tiny else "resnet101",
                  image_dtype=jnp.bfloat16)
    trainer = Trainer(model, TrainConfig(batch_size=BATCH, grad_clip=0.5))
    base = _synthetic_batch(BATCH, IMAGE, seed=1)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        base, train=False)
    variables = jax.device_put(variables)

    mem = getattr(jax.devices()[0], "memory_stats", lambda: None)() or {}
    record = {"label": opts.label, "batch": BATCH, "image": IMAGE,
              "hbm_limit_gb": round(mem.get("bytes_limit", 0) / 2**30, 2),
              "eval": {}, "train": {}}
    print(json.dumps({"hbm_limit_gb": record["hbm_limit_gb"]}), flush=True)
    for di, dup in enumerate(opts.dups):
        probe = measure_eval(
            model, variables, dup, opts.eval_iters, seed0=100_000 * di)
        iters = _calibrate_iters(probe["ms_per_batch"], opts.eval_iters, dup,
                                 opts.target_device_s, opts.max_stack_gb)
        if iters > opts.eval_iters:
            probe = _measure_with_backoff(
                lambda iters, s: measure_eval(model, variables, dup, iters, s),
                opts.eval_iters, iters, s=100_000 * di + 50)
        else:
            probe["iters"] = opts.eval_iters
        record["eval"][f"dup{dup}"] = probe
        print(json.dumps({f"eval dup{dup}": probe}), flush=True)
    if opts.w8a8:
        from visuelle2_tpu.models import quantized_resnet as qr

        qapply, calib = qr.build_serving_path(
            model, variables,
            [jax.device_put(_synthetic_batch(BATCH, IMAGE, seed=900 + i))
             for i in range(2)])
        print(json.dumps({"w8a8_scales": len(calib)}), flush=True)
        record["eval_w8a8"] = {}
        for di, dup in enumerate(opts.dups):
            probe = measure_eval(model, variables, dup, opts.eval_iters,
                                 seed0=100_000 * di + 70, apply_fn=qapply)
            iters = _calibrate_iters(probe["ms_per_batch"], opts.eval_iters,
                                     dup, opts.target_device_s,
                                     opts.max_stack_gb)
            if iters > opts.eval_iters:
                probe = _measure_with_backoff(
                    lambda iters, s: measure_eval(model, variables, dup,
                                                  iters, s, apply_fn=qapply),
                    opts.eval_iters, iters, s=100_000 * di + 77)
            else:
                probe["iters"] = opts.eval_iters
            record["eval_w8a8"][f"dup{dup}"] = probe
            print(json.dumps({f"eval_w8a8 dup{dup}": probe}), flush=True)
    for di, dup in enumerate(opts.dups):
        probe = measure_train(
            model, trainer, dup, opts.train_iters, seed0=100_000 * (di + 8))
        iters = _calibrate_iters(probe["step_ms"], opts.train_iters, dup,
                                 opts.target_device_s, opts.max_stack_gb)
        if iters > opts.train_iters:
            probe = _measure_with_backoff(
                lambda iters, s: measure_train(model, trainer, dup, iters, s),
                opts.train_iters, iters, s=100_000 * (di + 8) + 50)
        else:
            probe["iters"] = opts.train_iters
        record["train"][f"dup{dup}"] = probe
        print(json.dumps({f"train dup{dup}": probe}), flush=True)

    series = []
    if os.path.isfile(opts.out):
        with open(opts.out) as f:
            series = json.load(f)
    # One record per label: re-running a round replaces its entry.
    series = [r for r in series if r.get("label") != opts.label] + [record]
    with open(opts.out, "w") as f:
        json.dump(series, f, indent=1)
    print(json.dumps(record))
    print(f"series -> {opts.out}")


if __name__ == "__main__":
    main()
