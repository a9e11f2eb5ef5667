"""Experiment: are the slow ResNet 1x1 convs HBM-bandwidth-bound?

The roofline control (scripts/perf_roofline.py, docs/roofline_r3.json)
shows the early-stage 1x1 convolutions sustain only 24-51 TF/s while 3x3
convs and pure GEMMs hit ~190.  Hypothesis: these shapes are
memory-bound — as matmuls they have huge M (batch*H*W), small K/N, so
arithmetic intensity is low and the MXU starves on HBM reads.

Three predictions this script tests on the worst shape
(s1_1x1a_wide: 75x75 maps, 256 -> 64 channels):

1. **Batch scaling is flat in throughput** (time ~ linear in batch): a
   bandwidth-bound op cannot amortize anything with more rows.
2. **f32 IO is ~2x slower than bf16 IO**: time tracks bytes, not FLOPs.
3. **Implied HBM bandwidth** (bytes moved / time) sits near the chip's
   spec (~800 GB/s class for v5e), i.e. the op already runs at the
   memory speed-of-light and no kernel can make it faster at this shape.

    python scripts/perf_conv_membound.py --out docs/conv_membound_r3.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.perf_roofline import _time_scan, conv_out_dim  # noqa: E402

HIN, CIN, COUT, K, STRIDE = 75, 256, 64, 1, 1


def measure(batch, io_dtype):
    import jax.numpy as jnp
    from jax import lax

    dt = jnp.bfloat16 if io_dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    W = rng.standard_normal((K, K, CIN, COUT)).astype(np.float32) * 0.05

    def make_input(i):
        r = np.random.default_rng(2000 + i)
        return r.standard_normal((batch, HIN, HIN, CIN)).astype(np.float32)

    def fn(x, w):
        return lax.conv_general_dilated(
            x.astype(dt), w.astype(dt),
            window_strides=(STRIDE, STRIDE), padding=[(K // 2, K // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt)

    secs = _time_scan(fn, make_input, W)
    hout = conv_out_dim(HIN, K, STRIDE)
    m = batch * hout * hout
    flops = 2 * m * K * K * CIN * COUT
    size = 2 if io_dtype == "bf16" else 4
    byts = (m * CIN + m * COUT + K * K * CIN * COUT) * size
    return {"secs": secs, "tflops_per_sec": round(flops / secs / 1e12, 1),
            "implied_gb_per_sec": round(byts / secs / 1e9, 1),
            "ms": round(secs * 1e3, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    opts = ap.parse_args()

    results = {"shape": f"{HIN}x{HIN}x{CIN}->{COUT} 1x1"}
    for batch in (32, 128, 256):
        results[f"bf16_b{batch}"] = measure(batch, "bf16")
        print(json.dumps({f"bf16_b{batch}": results[f"bf16_b{batch}"]}),
              flush=True)
    results["f32_b128"] = measure(128, "f32")
    print(json.dumps({"f32_b128": results["f32_b128"]}), flush=True)

    b32, b128, b256 = (results[f"bf16_b{b}"]["secs"] for b in (32, 128, 256))
    results["batch_scaling_time_ratio_256_vs_32"] = round(b256 / b32, 2)
    results["f32_vs_bf16_time_ratio"] = round(
        results["f32_b128"]["secs"] / b128, 2)
    print(json.dumps(results))
    if opts.out:
        with open(opts.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
