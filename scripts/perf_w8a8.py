"""w8a8 int8 backbone vs bf16: whole-model serving throughput on the TPU.

Measures the flagship gated_v4 demand forecaster (ResNet-101 @ 299, batch
128) end-to-end in both execution paths:

* bf16  — the default serving path (bench.py's headline);
* w8a8  — models/quantized_resnet.py: int8 residual skeleton, int8xint8
  MXU convs, fused BN-fold/ReLU/requant epilogues.

Plus the numeric delta between the two paths on one batch, an int8-vs-bf16
4096**3 GEMM control (is the int8 MXU rate actually 2x on this chip, or is
the w8a8 win purely traffic? r2 measured 1.06x with a float-accum dot;
this re-tests with int32 accumulation), and cost_analysis cross-checks.

Methodology per CLAUDE.md benchmark-integrity rules: each timed number is
ONE jitted ``lax.scan`` over fully-distinct per-step batches with a host
fetch as the barrier, warmup inputs distinct from timed inputs, and the
measured dispatch+fetch round-trip floor subtracted.

    python scripts/perf_w8a8.py [--out docs/w8a8_r4.json]

Smoke mode (VIS2_BENCH_SMOKE=1): same logic on CPU with a tiny model.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, IMAGE, ITERS = 128, 299, 50


def _rt_floor(jax):
    # Distinct input per probe: the relay dedupes bit-identical dispatches
    # (CLAUDE.md "Benchmark integrity"), which would time a cached path and
    # under-measure the floor.
    noop = jax.jit(lambda x: x + 1.0)
    np.asarray(noop(jax.device_put(np.float32(0.0))))
    vals = []
    for i in range(5):
        d = jax.device_put(np.float32(i + 1.0))
        t0 = time.perf_counter()
        np.asarray(noop(d))
        vals.append(time.perf_counter() - t0)
    return min(vals)


def _time_scan(fn, variables, stack_warm, stack_timed, rt, iters):
    np.asarray(fn(variables, stack_warm))  # compile + warmup
    t0 = time.perf_counter()
    np.asarray(fn(variables, stack_timed))
    return (time.perf_counter() - t0 - rt) / iters


def _gemm_control(jax, jnp, rt, steps=256, n=4096):
    """n**3 dot: bf16 vs int8-with-int32-accum, weight-perturb scan.

    Two measurement bugs in the first r4 version of this control, both
    catchable from its own smoke numbers (a single CPU core "sustained"
    4 TF/s) and both fixed here:

    * it fetched the whole n x n product through the relay tunnel, so the
      timing was tunnel bandwidth (~5 "TF/s" for both dtypes), not MXU —
      the fetch is now a scalar;
    * the product was carried but never READ by the next step, so XLA
      dead-code-eliminated every dot except the last — each step's product
      now folds into a running scalar sum that the function returns, which
      keeps every dot live (scan iterations execute sequentially on the
      device regardless).

    Warmup and timed dispatches use distinct input pairs (the relay
    dedupes identical dispatches).
    """
    rng = np.random.default_rng(7)

    def pair(dtype):
        if dtype == "int8":
            return (jnp.asarray(rng.integers(-127, 128, (n, n), np.int8)),
                    jnp.asarray(rng.integers(-127, 128, (n, n), np.int8)))
        return (jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16),
                jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16))

    gflop = 2 * n**3 / 1e9

    @jax.jit
    def run_i8(x, w):
        def body(carry, _):
            w_t, acc = carry
            y = jax.lax.dot(x, w_t, preferred_element_type=jnp.int32)
            return (w_t + jnp.int8(1),
                    acc + jnp.sum(y, dtype=jnp.float32)), ()
        (w_f, acc), _ = jax.lax.scan(
            body, (w, jnp.zeros((), jnp.float32)), None, length=steps)
        return jnp.sum(w_f.astype(jnp.int32)), acc

    @jax.jit
    def run_bf(x, w):
        def body(carry, _):
            w_t, acc = carry
            y = jax.lax.dot(x, w_t)
            return (w_t * jnp.bfloat16(1.0000305),
                    acc + jnp.sum(y.astype(jnp.float32))), ()
        (w_f, acc), _ = jax.lax.scan(
            body, (w, jnp.zeros((), jnp.float32)), None, length=steps)
        return jnp.sum(w_f.astype(jnp.float32)), acc

    out = {}
    for name, fn in (("bf16", run_bf), ("int8", run_i8)):
        warm, timed = pair(name), pair(name)  # distinct: the relay dedupes
        np.asarray(fn(*warm)[1])              # identical dispatches
        t0 = time.perf_counter()
        np.asarray(fn(*timed)[1])
        dt = (time.perf_counter() - t0 - rt) / steps
        out[name] = {"secs": dt, "tflops_per_sec": round(gflop / dt / 1e3, 1)}
    out["int8_over_bf16"] = round(out["bf16"]["secs"] / out["int8"]["secs"], 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/w8a8_r4.json")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--skip_gemm", action="store_true")
    ap.add_argument("--gemm_only", action="store_true",
                    help="re-measure just the 4096^3 int8-vs-bf16 control "
                         "and merge it into --out (one cheap tunnel claim)")
    args = ap.parse_args()

    smoke = os.environ.get("VIS2_BENCH_SMOKE") == "1"
    # A real 256-step 4096^3 control is hours on one CPU core: smoke mode
    # shrinks it to a code-path check (the numbers are decorative there).
    gemm_kw = dict(steps=8, n=256) if smoke else {}

    if args.gemm_only:
        import jax

        if smoke:
            jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp

        rt = _rt_floor(jax)
        print(f"rt floor {rt * 1e3:.1f} ms", flush=True)
        ctl = _gemm_control(jax, jnp, rt, **gemm_kw)
        print("gemm control:", json.dumps(ctl), flush=True)
        res = {}
        if os.path.isfile(args.out):
            with open(args.out) as f:
                res = json.load(f)
        res["gemm_4096_control"] = ctl
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print("->", args.out, flush=True)
        return

    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from visuelle2_tpu.models import VocabSizes, build
    from visuelle2_tpu.models import quantized_resnet as qr

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
    if args.iters:
        ITERS = args.iters

    batch = _synthetic_batch(BATCH, IMAGE, seed=1)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    variables = jax.device_put(variables)

    calib = qr.calibrate_model(
        model, variables,
        [jax.device_put(_synthetic_batch(BATCH, IMAGE, seed=900 + i))
         for i in range(2)])
    qapply = qr.quantized_apply_fn(model, calib)
    print(f"calibrated {len(calib)} activation scales", flush=True)

    def make_scan(apply_fn):
        @jax.jit
        def scan_batches(variables, batch_stack):
            def body(_, batch_t):
                f, _aux = apply_fn(variables, batch_t, train=False)
                return 0, f
            _, fs = jax.lax.scan(body, 0, batch_stack)
            return fs
        return scan_batches

    scan_bf16 = make_scan(model.apply)
    scan_w8a8 = make_scan(qapply)

    # Numeric delta on one batch (also proves the quantized path compiles
    # and runs on this backend before the big timed stacks go up).
    d1 = jax.device_put(batch)
    f_ref = np.asarray(model.apply(variables, d1, train=False)[0], np.float32)
    f_q = np.asarray(qapply(variables, d1)[0], np.float32)
    rel = float(np.linalg.norm(f_q - f_ref) / np.linalg.norm(f_ref))
    print(f"forecast delta w8a8 vs bf16: rel_l2={rel:.4f} "
          f"max_abs={float(np.max(np.abs(f_q - f_ref))):.4f}", flush=True)

    def _stack(seed0):
        steps = [_synthetic_batch(BATCH, IMAGE, seed=seed0 + i)
                 for i in range(ITERS)]
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *steps)

    d_warm = jax.device_put(_stack(100))
    d_timed = jax.device_put(_stack(200))
    rt = _rt_floor(jax)
    print(f"rt floor {rt * 1e3:.1f} ms", flush=True)

    res = {"device": jax.devices()[0].device_kind, "batch": BATCH,
           "image": IMAGE, "iters": ITERS,
           "forecast_delta_rel_l2": round(rel, 5), "paths": {}}
    for name, fn in (("bf16", scan_bf16), ("w8a8", scan_w8a8)):
        dt = _time_scan(fn, variables, d_warm, d_timed, rt, ITERS)
        ca = fn.lower(variables, d_timed).compile().cost_analysis()
        res["paths"][name] = {
            "ms_per_batch": round(dt * 1e3, 3),
            "forecasts_per_sec": round(BATCH / dt, 1),
            "cost_gflops_per_batch": round(
                float(ca.get("flops", 0.0)) / ITERS / 1e9, 1),
            "cost_hbm_gb_per_batch": round(
                float(ca.get("bytes accessed", 0.0)) / ITERS / 1e9, 3),
        }
        print(f"{name}: {dt * 1e3:.2f} ms/batch = {BATCH / dt:.0f} "
              f"forecasts/s", flush=True)
    res["w8a8_speedup"] = round(
        res["paths"]["bf16"]["ms_per_batch"] /
        res["paths"]["w8a8"]["ms_per_batch"], 3)

    if not args.skip_gemm:
        del d_warm, d_timed
        try:
            res["gemm_4096_control"] = _gemm_control(jax, jnp, rt, **gemm_kw)
            print("gemm control:", json.dumps(res["gemm_4096_control"]),
                  flush=True)
        except Exception as e:  # control is informative, not load-bearing
            res["gemm_4096_control"] = {"error": repr(e)}
            print("gemm control failed:", repr(e), flush=True)

    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print("->", args.out, flush=True)


if __name__ == "__main__":
    main()
