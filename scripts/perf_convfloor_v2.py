"""Corrected per-shape conv roofline — fixes a measurement artifact in r3.

Round 3's roofline (scripts/perf_roofline.py::_time_scan) made per-step
inputs distinct by perturbing the conv INPUT inside the scan:

    x_t = x * (1 + (i + carry) * 1e-6); y = conv(x_t, W)

with the base ``x`` kept in FLOAT32.  For the early-stage ResNet shapes the
activation is hundreds of MB, so every timed step paid: read x in f32 (2x
the conv's own bf16 bytes) + materialize x_t (conv inputs are not fused
with elementwise producers) + the conv re-reading x_t — roughly 3-4x the
conv's true HBM traffic.  On BANDWIDTH-bound shapes that inflated the
measured time ~2-4x and produced the "24-42 TF/s hardware floor" story of
docs/RESULTS_r3.md (it also explains the f32==bf16 "falsification": the f32
base read dominated both).  Compute-bound shapes (3x3s, late stages, big
GEMMs) were barely affected, which is why the GEMM control hit 98.5% of
peak and the late stages 165-192 TF/s.

The corrected harness (validated kernel-side by perf_pallas_convfloor.py,
where the same shapes as plain dots hit full HBM bandwidth):

* the INPUT is loop-invariant, device-resident, in the conv's own dtype —
  it streams HBM->MXU each step exactly like a real forward pass;
* the WEIGHT (KB-sized) is perturbed by a carry-dependent factor, so every
  step is distinct (no relay dedup), serialized (carry chains steps), and
  nothing big is rewritten;
* the carry reads mean(y) over the FULL output (no dead-code elimination of
  output rows), and every compiled scan is verified against
  ``cost_analysis()`` FLOPs — any DCE shows up as missing FLOPs;
* scan length auto-calibrates to ~``target_s`` device seconds and the
  measured ~28 ms dispatch+fetch floor is subtracted
  (perf_roofline._roundtrip_floor).

Also measured, to attribute the model-vs-roofline gap:

* ``artifact_check``: one shape timed BOTH ways (weight-perturb vs the r3
  input-perturb) — documents the artifact's size on hardware;
* ``epilogue``: conv vs conv+BN(inference)+relu at the same shape — the
  cost of the post-conv elementwise pass (does XLA fuse it into the conv's
  output or pay an extra activation-sized read+write?);
* ``chain``: a bottleneck-like conv->bn->relu->conv chain vs the sum of its
  isolated layers — inter-layer materialization cost.

    python scripts/perf_convfloor_v2.py --out docs/convfloor_v2_r4.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from perf_roofline import (  # noqa: E402
    BATCH,
    RESNET101_CONVS,
    _roundtrip_floor,
    conv_out_dim,
)


def conv_flops(hin, cin, cout, k, stride, batch=BATCH):
    hout = conv_out_dim(hin, k, stride)
    return 2.0 * batch * hout * hout * k * k * cin * cout


def _verify_no_dce(jitted, args, expected_flops_per_step):
    """cost_analysis FLOPs of the compiled scan must cover the conv work —
    dead-code elimination of output rows/columns would show up here.  XLA
    counts a scan's while-loop BODY once regardless of trip count
    (verified on this jax), so the expectation is per-step."""
    compiled = jitted.lower(*args).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0)) if ca else 0.0
    if flops < 0.8 * expected_flops_per_step:
        raise RuntimeError(
            f"DCE suspected: cost_analysis flops {flops:.3e} < 80% of "
            f"per-step expectation {expected_flops_per_step:.3e}")
    return flops


def time_scan_weight_perturb(fn, x, w, *, flops_per_step, target_s=1.5,
                             max_iters=65536):
    """secs/step for ``fn(x, w_t)``: x loop-invariant (streams HBM each
    step), w carry-perturbed (distinct + serialized steps), full-output
    carry, cost_analysis DCE guard, floor-subtracted."""
    import jax
    import jax.numpy as jnp

    rt = _roundtrip_floor()

    @jax.jit
    def scan(x, w, idx):
        def body(carry, i):
            w_t = w * (1.0 + (i.astype(jnp.float32) + carry) * 1e-6).astype(
                w.dtype)
            y = fn(x, w_t)
            return jnp.mean(y).astype(jnp.float32), 0
        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), idx)
        return tot

    dx, dw = jax.device_put(x), jax.device_put(w)

    def run(iters, lo, verify=False):
        # Warm on a DISTINCT idx range (same length -> same program): the
        # relay dedupes identical dispatches, so the timed dispatch must
        # not be bit-identical to the warmup (bench.py integrity rules).
        warm = jax.device_put(
            np.arange(lo + iters, lo + 2 * iters, dtype=np.int32))
        idx = jax.device_put(np.arange(lo, lo + iters, dtype=np.int32))
        if verify:
            _verify_no_dce(scan, (dx, dw, idx), flops_per_step)
        np.asarray(scan(dx, dw, warm))  # compile+warm this length
        t0 = time.perf_counter()
        np.asarray(scan(dx, dw, idx))
        return time.perf_counter() - t0

    it0 = 32
    el0 = run(it0, 1000, verify=True)
    per0 = max((el0 - rt) / it0, 1e-8)
    iters = int(min(max_iters, max(it0, target_s / per0)))
    if iters <= it0 * 1.5:
        return per0
    el = run(iters, 0)
    return max(el - rt, 1e-9) / iters


def _conv_fn(k, stride, dtype):
    import jax.numpy as jnp
    from jax import lax

    dt = jnp.bfloat16 if dtype == "bf16" else jnp.float32

    def fn(x, w):
        return lax.conv_general_dilated(
            x.astype(dt), w.astype(dt),
            window_strides=(stride, stride), padding=[(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    return fn


def measure_conv_shape(name, hin, cin, cout, k, stride, dtypes=("bf16",),
                       target_s=1.5):
    """Corrected per-shape measurement.  Returns dict with per-dtype secs,
    TF/s, and the bandwidth roofline for comparison."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    flops = conv_flops(hin, cin, cout, k, stride)
    hout = conv_out_dim(hin, k, stride)
    out = {"hin": hin, "cin": cin, "cout": cout, "k": k, "stride": stride,
           "gflops": round(flops / 1e9, 2), "out_dim": hout}
    xf = rng.standard_normal((BATCH, hin, hin, cin)).astype(np.float32) * 0.5
    wf = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.05
    for dtype in dtypes:
        dt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        x, w = dt(xf), dt(wf)
        secs = time_scan_weight_perturb(
            _conv_fn(k, stride, dtype), x, w,
            flops_per_step=flops, target_s=target_s)
        itemsize = 2 if dtype == "bf16" else 4
        in_bytes = BATCH * hin * hin * cin * itemsize
        out_bytes = BATCH * hout * hout * cout * 4  # f32 accum output
        out[dtype] = {
            "secs": secs,
            "tflops_per_sec": round(flops / secs / 1e12, 1),
            "min_traffic_mb": round((in_bytes + out_bytes) / 2**20, 1),
            "achieved_gbps": round((in_bytes + out_bytes) / secs / 1e9, 1),
        }
        print(f"{name}[{dtype}]: {out[dtype]['tflops_per_sec']} TF/s "
              f"({secs * 1e3:.3f} ms, {out[dtype]['achieved_gbps']} GB/s "
              f"over {out[dtype]['min_traffic_mb']} MB min traffic)",
              flush=True)
    return out


def measure_artifact_check(target_s=1.5):
    """The same shape timed with the r3 input-perturb harness (f32 base) vs
    the corrected weight-perturb harness: documents the artifact size."""
    import jax
    import jax.numpy as jnp

    name, hin, cin, cout, k, stride = "s2_1x1a_wide", 38, 512, 128, 1, 1
    flops = conv_flops(hin, cin, cout, k, stride)
    rng = np.random.default_rng(0)
    xf = rng.standard_normal((BATCH, hin, hin, cin)).astype(np.float32) * 0.5
    wf = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.05
    fn = _conv_fn(k, stride, "bf16")

    corrected = time_scan_weight_perturb(
        fn, jnp.bfloat16(xf), jnp.bfloat16(wf), flops_per_step=flops,
        target_s=target_s)

    # r3 harness: input-perturb with an f32 base (perf_roofline._time_scan).
    rt = _roundtrip_floor()

    @jax.jit
    def scan_r3(x, w, idx):
        def body(carry, i):
            x_t = x * (1.0 + (i.astype(jnp.float32) + carry) * 1e-6)
            y = fn(x_t, w)
            return jnp.mean(y).astype(jnp.float32), 0
        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), idx)
        return tot

    dx, dw = jax.device_put(xf), jax.device_put(jnp.bfloat16(wf))

    def run(iters, lo):
        # Distinct warm vs timed idx ranges (relay dedup hygiene); the
        # r3 INPUT-perturb body is the artifact being demonstrated here.
        warm = jax.device_put(
            np.arange(lo + iters, lo + 2 * iters, dtype=np.int32))
        idx = jax.device_put(np.arange(lo, lo + iters, dtype=np.int32))
        np.asarray(scan_r3(dx, dw, warm))
        t0 = time.perf_counter()
        np.asarray(scan_r3(dx, dw, idx))
        return time.perf_counter() - t0

    el0 = run(32, 1000)
    per0 = max((el0 - rt) / 32, 1e-8)
    iters = int(max(32, target_s / per0))
    legacy = (max(run(iters, 0) - rt, 1e-9) / iters) if iters > 48 else per0

    res = {
        "shape": name,
        "corrected_weight_perturb": {
            "secs": corrected,
            "tflops_per_sec": round(flops / corrected / 1e12, 1)},
        "r3_input_perturb_f32base": {
            "secs": legacy, "tflops_per_sec": round(flops / legacy / 1e12, 1)},
        "inflation_x": round(legacy / corrected, 2),
    }
    print(f"artifact_check[{name}]: corrected "
          f"{res['corrected_weight_perturb']['tflops_per_sec']} TF/s vs r3 "
          f"harness {res['r3_input_perturb_f32base']['tflops_per_sec']} TF/s "
          f"(inflation {res['inflation_x']}x)", flush=True)
    return res


def measure_epilogue_and_chain(target_s=1.5):
    """conv vs conv+BN(inference)+relu, and a bottleneck-like two-conv chain
    vs the sum of its isolated layers — the inter-layer cost the per-shape
    roofline cannot see."""
    import jax.numpy as jnp

    hin, cin, cmid = 38, 512, 128
    rng = np.random.default_rng(0)
    x = jnp.bfloat16(rng.standard_normal(
        (BATCH, hin, hin, cin)).astype(np.float32) * 0.5)
    w1 = jnp.bfloat16(rng.standard_normal(
        (1, 1, cin, cmid)).astype(np.float32) * 0.05)
    w2 = jnp.bfloat16(rng.standard_normal(
        (1, 1, cmid, cin)).astype(np.float32) * 0.05)
    scale1 = jnp.float32(1.0 + 0.01 * rng.standard_normal(cmid))
    shift1 = jnp.float32(0.01 * rng.standard_normal(cmid))
    f1 = conv_flops(hin, cin, cmid, 1, 1)
    f2 = conv_flops(hin, cmid, cin, 1, 1)
    conv = _conv_fn(1, 1, "bf16")

    def bare(x, w):
        return conv(x, w)

    def with_epi(x, w):
        return jnp.maximum(conv(x, w) * scale1 + shift1, 0.0)

    def chain(x, w):
        h = jnp.maximum(conv(x, w) * scale1 + shift1, 0.0)
        return conv(h.astype(jnp.bfloat16), w2)

    s_bare = time_scan_weight_perturb(bare, x, w1, flops_per_step=f1,
                                      target_s=target_s)
    s_epi = time_scan_weight_perturb(with_epi, x, w1, flops_per_step=f1,
                                     target_s=target_s)
    s_chain = time_scan_weight_perturb(chain, x, w1,
                                       flops_per_step=f1 + f2,
                                       target_s=target_s)
    # Isolated second layer at its own shape for the chain comparison.
    xm = jnp.bfloat16(rng.standard_normal(
        (BATCH, hin, hin, cmid)).astype(np.float32) * 0.5)
    s_l2 = time_scan_weight_perturb(bare, xm, w2, flops_per_step=f2,
                                    target_s=target_s)
    res = {
        "shape": f"{hin}x{hin} {cin}->{cmid}->{cin} 1x1s",
        "conv_secs": s_bare,
        "conv_bn_relu_secs": s_epi,
        "epilogue_overhead_x": round(s_epi / s_bare, 3),
        "chain_secs": s_chain,
        "sum_isolated_secs": s_bare + s_l2,
        "chain_over_sum_x": round(s_chain / (s_bare + s_l2), 3),
    }
    print(f"epilogue: conv {s_bare * 1e3:.3f} ms vs conv+bn+relu "
          f"{s_epi * 1e3:.3f} ms ({res['epilogue_overhead_x']}x); chain "
          f"{s_chain * 1e3:.3f} ms vs sum {1e3 * (s_bare + s_l2):.3f} ms "
          f"({res['chain_over_sum_x']}x)", flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/convfloor_v2_r4.json")
    ap.add_argument("--target_s", type=float, default=1.5)
    ap.add_argument("--conv_names", nargs="+", default=[],
                    help="measure only these shapes (chunked runs)")
    ap.add_argument("--dtypes", nargs="+", default=["bf16"],
                    choices=["bf16", "f32"])
    ap.add_argument("--skip_extras", action="store_true",
                    help="skip the artifact/epilogue/chain extras")
    opts = ap.parse_args()

    import jax

    results = {"device": jax.devices()[0].device_kind, "batch": BATCH,
               "method": "weight-perturb scan, loop-invariant input, "
                         "cost_analysis DCE guard, rt-floor subtracted",
               "convs": {}}
    for name, hin, cin, cout, k, stride, count in RESNET101_CONVS:
        if opts.conv_names and name not in opts.conv_names:
            continue
        r = measure_conv_shape(name, hin, cin, cout, k, stride,
                               dtypes=tuple(opts.dtypes),
                               target_s=opts.target_s)
        r["count"] = count
        results["convs"][name] = r

    if not opts.skip_extras:
        results["artifact_check"] = measure_artifact_check(opts.target_s)
        results["epilogue_chain"] = measure_epilogue_and_chain(opts.target_s)

    merged = results
    if os.path.isfile(opts.out):
        with open(opts.out) as f:
            merged = json.load(f)
        merged["convs"].update(results["convs"])
        for key in ("artifact_check", "epilogue_chain"):
            if key in results:
                merged[key] = results[key]
    if merged["convs"]:
        for dtype in opts.dtypes:
            have = [r for r in merged["convs"].values() if dtype in r]
            if not have:
                continue
            tf_ = sum(r["gflops"] * r["count"] for r in have)
            ts_ = sum(r[dtype]["secs"] * r["count"] for r in have)
            merged[f"conv_weighted_{dtype}"] = {
                "shapes_measured": len(have),
                "total_gflops_per_batch": round(tf_, 1),
                "sum_secs_per_batch_ms": round(ts_ * 1e3, 2),
                "flop_weighted_tflops_per_sec": round(tf_ / ts_ / 1e3, 1),
            }
            print(json.dumps({f"conv_weighted_{dtype}":
                              merged[f"conv_weighted_{dtype}"]}), flush=True)
    with open(opts.out, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"-> {opts.out}")


if __name__ == "__main__":
    main()
