"""Roofline controls on the real chip: what the hardware+XLA actually
sustain for (a) pure large GEMMs and (b) each ResNet-101 conv shape.

VERDICT r2: the 3.9k forecasts/s headline is ~56% of bf16 peak and the gap
was *asserted* to be "XLA's conv lowering".  This script turns that into a
measured attribution: sustained bf16 TF/s for square GEMMs (the MXU's best
case) and for every distinct convolution shape in the ResNet-101 @299
backbone (batch 128), FLOP-weighted so the per-shape efficiencies must
reconstruct the measured whole-model number.

Relay-safe methodology (CLAUDE.md "Benchmark integrity"): each measurement
is ONE jitted ``lax.scan`` over DISTINCT per-step inputs whose carry chains
consecutive steps (the output feeds the next step's input perturbation), so
nothing can be hoisted, deduped, or overlapped; the host fetch is the
barrier.  FLOPs cross-checked against ``compiled.cost_analysis()``.

    python scripts/perf_roofline.py --out docs/roofline_r3.json
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


_RT_FLOOR = None  # measured dispatch+fetch round-trip floor (secs)


def _roundtrip_floor():
    """Relay dispatch + host-fetch latency for a near-empty program: the
    additive floor every timed dispatch pays.  Short scans of fast ops would
    otherwise be dominated by it (a 10-step scan of 0.1 ms GEMMs is ~97%
    round trip) — measurements below calibrate their scan length so device
    time swamps this floor, and subtract it."""
    global _RT_FLOOR
    if _RT_FLOOR is None:
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: x + 1.0)
        d = jax.device_put(np.float32(0.0))
        np.asarray(f(d))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(d))
            ts.append(time.perf_counter() - t0)
        _RT_FLOOR = min(ts)
    return _RT_FLOOR


def _time_scan(fn, make_input, *consts, target_secs=2.0, max_iters=200_000):
    """ONE lax.scan dispatch over distinct inputs; returns secs/step.

    Per-step inputs are derived ON DEVICE from one base tensor, a step index,
    and the previous step's output mean (the scan carry): every step's input
    is distinct (no relay dedup), data-depends on the previous output (no
    overlap, no hoisting), and only one base tensor occupies HBM (large conv
    inputs would not fit as a host-built [iters, ...] stack).

    The scan length auto-calibrates so device time is ~``target_secs`` —
    long enough to swamp the measured round-trip floor — and the floor is
    subtracted from the elapsed time.
    """
    import jax
    import jax.numpy as jnp

    rt = _roundtrip_floor()

    @jax.jit
    def scan(consts, x, idx):
        def body(carry, i):
            x_t = x * (1.0 + (i.astype(jnp.float32) + carry) * 1e-6)
            y = fn(x_t, *consts)
            return jnp.mean(y).astype(jnp.float32), 0
        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), idx)
        return tot

    d_consts = jax.device_put(consts)
    d_x = jax.device_put(make_input(0))

    def run(iters, lo):
        idx = jax.device_put(np.arange(lo, lo + iters, dtype=np.int32))
        np.asarray(scan(d_consts, d_x, idx))  # compile for this length
        t0 = time.perf_counter()
        np.asarray(scan(d_consts, d_x, idx))
        return time.perf_counter() - t0

    # Calibration pass: short scan, estimate per-step cost (floor-corrected).
    it0 = 32
    el0 = run(it0, 1000)
    per0 = max((el0 - rt) / it0, 1e-7)
    iters = int(min(max_iters, max(it0, target_secs / per0)))
    if iters <= it0 * 1.5:
        return per0
    el = run(iters, 0)
    return max(el - rt, 1e-9) / iters


def measure_gemm(n, dtype="bfloat16"):
    import jax.numpy as jnp

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    B = rng.standard_normal((n, n)).astype(np.float32)

    def make_input(i):
        r = np.random.default_rng(1000 + i)
        return r.standard_normal((n, n)).astype(np.float32)

    def fn(a, b):
        return jnp.dot(a.astype(dt), b.astype(dt),
                       preferred_element_type=jnp.float32)

    secs = _time_scan(fn, make_input, B.astype(np.float32))
    tf = 2 * n**3 / secs / 1e12
    return {"secs_per_step": secs, "tflops_per_sec": round(tf, 1)}


# Every distinct conv shape in ResNet-101 @299 (NHWC), with its multiplicity
# in one forward pass.  H/W are the INPUT spatial dims per torchvision
# semantics at 299 input: stem 299->150, pool->75, stage2 38, stage3 19,
# stage4 10.
RESNET101_CONVS = [
    # name, Hin, Cin, Cout, k, stride, count
    ("stem7x7", 299, 3, 64, 7, 2, 1),
    ("s1_1x1a", 75, 64, 64, 1, 1, 1),
    ("s1_1x1a_wide", 75, 256, 64, 1, 1, 2),
    ("s1_3x3", 75, 64, 64, 3, 1, 3),
    ("s1_1x1b", 75, 64, 256, 1, 1, 3),
    ("s1_proj", 75, 64, 256, 1, 1, 1),
    ("s2_1x1a", 75, 256, 128, 1, 1, 1),
    ("s2_3x3_s2", 75, 128, 128, 3, 2, 1),
    ("s2_1x1a_wide", 38, 512, 128, 1, 1, 3),
    ("s2_3x3", 38, 128, 128, 3, 1, 3),
    ("s2_1x1b", 38, 128, 512, 1, 1, 4),
    ("s2_proj", 75, 256, 512, 1, 2, 1),
    ("s3_1x1a", 38, 512, 256, 1, 1, 1),
    ("s3_3x3_s2", 38, 256, 256, 3, 2, 1),
    ("s3_1x1a_wide", 19, 1024, 256, 1, 1, 22),
    ("s3_3x3", 19, 256, 256, 3, 1, 22),
    ("s3_1x1b", 19, 256, 1024, 1, 1, 23),
    ("s3_proj", 38, 512, 1024, 1, 2, 1),
    ("s4_1x1a", 19, 1024, 512, 1, 1, 1),
    ("s4_3x3_s2", 19, 512, 512, 3, 2, 1),
    ("s4_1x1a_wide", 10, 2048, 512, 1, 1, 2),
    ("s4_3x3", 10, 512, 512, 3, 1, 2),
    ("s4_1x1b", 10, 512, 2048, 1, 1, 3),
    ("s4_proj", 19, 1024, 2048, 1, 2, 1),
]


def conv_out_dim(h, k, stride):
    pad = k // 2
    return (h + 2 * pad - k) // stride + 1


def measure_conv(hin, cin, cout, k, stride, batch=BATCH):
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    W = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.05

    def make_input(i):
        r = np.random.default_rng(2000 + i)
        return r.standard_normal((batch, hin, hin, cin)).astype(np.float32)

    def fn(x, w):
        return lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            window_strides=(stride, stride), padding=[(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    secs = _time_scan(fn, make_input, W)
    hout = conv_out_dim(hin, k, stride)
    flops = 2 * batch * hout * hout * k * k * cin * cout
    return {"secs": secs, "gflops": round(flops / 1e9, 2),
            "tflops_per_sec": round(flops / secs / 1e12, 1),
            "out_dim": hout}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--gemm_sizes", type=int, nargs="+",
                    default=[2048, 4096, 8192])
    ap.add_argument("--skip_convs", action="store_true")
    ap.add_argument("--conv_names", nargs="+", default=[],
                    help="measure only these conv shapes (chunked runs)")
    opts = ap.parse_args()

    import jax

    results = {"device": jax.devices()[0].device_kind, "batch": BATCH,
               "gemm_bf16": {}, "convs": {}}
    for n in opts.gemm_sizes:
        results["gemm_bf16"][str(n)] = measure_gemm(n)
        print(json.dumps({f"gemm{n}": results["gemm_bf16"][str(n)]}),
              flush=True)

    if not opts.skip_convs:
        for name, hin, cin, cout, k, stride, count in RESNET101_CONVS:
            if opts.conv_names and name not in opts.conv_names:
                continue
            r = measure_conv(hin, cin, cout, k, stride)
            r["count"] = count
            results["convs"][name] = r
            print(json.dumps({name: r}), flush=True)

    print(json.dumps(results))
    if opts.out:
        merged = results
        if os.path.isfile(opts.out):
            with open(opts.out) as f:
                merged = json.load(f)
            merged["gemm_bf16"].update(results["gemm_bf16"])
            merged["convs"].update(results["convs"])
        # FLOP-weighted totals over whatever shapes have been measured so
        # far (chunked runs accumulate into one file).
        if merged["convs"]:
            tf_ = sum(r["gflops"] * r["count"] for r in merged["convs"].values())
            ts_ = sum(r["secs"] * r["count"] for r in merged["convs"].values())
            merged["conv_weighted"] = {
                "shapes_measured": len(merged["convs"]),
                "total_gflops_per_batch": round(tf_, 1),
                "sum_secs_per_batch_ms": round(ts_ * 1e3, 2),
                "flop_weighted_tflops_per_sec": round(tf_ / ts_ / 1e3, 1),
            }
        with open(opts.out, "w") as f:
            json.dump(merged, f, indent=1)
        print(f"-> {opts.out}")


if __name__ == "__main__":
    main()
