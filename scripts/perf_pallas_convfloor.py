"""Kernel-level probe of the narrow-1x1-conv MXU floor (VERDICT r3 weak #1).

The round-3 roofline pinned the model's speed-of-light to a shape-dependent
XLA floor on the narrow 1x1 convs (24 TF/s at [720k x 256 -> 64], 42-48 TF/s
at [185k x 512 -> 128]; docs/roofline_r3.json) and falsified f32-vs-bf16 and
dot-vs-conv differences — but every falsification went THROUGH XLA.  This
script probes the floor with hand-written Pallas kernels:

* ``pallas_bf16``  — M-tiled matmul, weights VMEM-resident, Mosaic's grid
  pipeline double-buffering the A tiles (HBM -> VMEM overlapped with MXU).
* ``pallas_int8``  — same, int8 x int8 -> int32 MXU path (2x MXU rate AND
  half the A bytes: if the floor is HBM-bandwidth, this is the lever).
* ``xla_bf16`` / ``xla_int8`` — the XLA dots for the same shapes (control).
* ``copy_bw``      — a read-only reduction over A at the same tile shape:
  the achievable HBM GB/s for this access pattern, i.e. the bandwidth
  roofline these shapes sit under (368 MB of A at ~800 GB/s is ~0.46 ms —
  41 TF/s for shape A: the 24 TF/s XLA floor is ~57% of even that).

Timing methodology per CLAUDE.md benchmark integrity: ONE jitted lax.scan
per measurement, step inputs made distinct by perturbing the (tiny) WEIGHT
with a carry-dependent factor — the result depends on the carry, so steps
cannot be deduped, hoisted, or overlapped, while the big A tensor stays
loop-invariant in HBM (perturbing A itself would add a full elementwise pass
over 368 MB and corrupt a bandwidth-bound measurement; this exact artifact
inflated the r3 conv roofline — see perf_convfloor_v2.py).  The carry reads
mean/sum of the FULL output: slicing it lets XLA dead-code-eliminate the
unread output rows/columns (observed: the first r4 run's y[:128,:1] int8
carry produced "1.5e9 TF/s"), at the cost of one output-sized read per step
(~+25% traffic on shape B — the reported TF/s are slightly conservative).
Scan length auto-calibrates to ~1.5 s device time so the ~28 ms
dispatch+fetch floor (measured and subtracted,
scripts/perf_roofline.py::_roundtrip_floor) is noise, not signal.

Decision rule (VERDICT r4 item 4): any kernel >1.3x the XLA floor on these
shapes reopens the headline; otherwise the 10x-at-d=1 question is closed on
kernel-level evidence.  Results -> docs/convfloor_r4.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from perf_roofline import _roundtrip_floor  # noqa: E402

# The two worst per-shape floors (docs/roofline_r3.json, batch 128):
# s1_1x1a(+wide): 128*75*75 rows, 256 -> 64   @ 23.7-24.1 TF/s
# s2_1x1a_wide:   128*38*38 rows, 512 -> 128  @ 42.1 TF/s
# M rounded to the tile grid (the probe's subject is the shape class).
SHAPES = {
    "A_720k_256_64": dict(m=720896, k=256, n=64),
    "B_184k_512_128": dict(m=184320, k=512, n=128),
}
TILE_M = 2048


def _calibrated(run, rt, target_s=1.5, it0=64, max_iters=65536):
    """Auto-calibrate scan length so device time swamps the ~28 ms
    dispatch+fetch floor (a 64-step scan of 0.2-0.5 ms matmuls is only
    ~15-30 ms total — the r4 first run of this script produced garbage
    rates for exactly this reason), then floor-subtract."""
    el0 = run(it0, 1000)
    per0 = max((el0 - rt) / it0, 1e-8)
    iters = int(min(max_iters, max(it0, target_s / per0)))
    if iters <= it0 * 1.5:
        return per0
    el = run(iters, 0)
    return max(el - rt, 1e-9) / iters


def _time_scan_wperturb(fn, x, w, steps=64):
    """secs/step for ``fn(x, w_t)`` over a scan with carry-perturbed weights
    (distinct + serialized steps; x loop-invariant by design).  The carry
    reads mean(y) over the FULL output: a row-sliced carry lets XLA narrow
    the dot to the sliced rows (dead-code elimination — observed on the
    int8 path in the first r4 run)."""
    import jax
    import jax.numpy as jnp

    rt = _roundtrip_floor()

    @jax.jit
    def scan(x, w, idx):
        def body(carry, i):
            w_t = w * (1.0 + (i.astype(jnp.float32) + carry) * 1e-6).astype(
                w.dtype)
            y = fn(x, w_t)
            return jnp.mean(y.astype(jnp.float32)), 0
        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), idx)
        return tot

    dx, dw = jax.device_put(x), jax.device_put(w)

    def run(iters, lo):
        # Warm on a DISTINCT idx range (same length -> same program): the
        # relay dedupes identical dispatches, so the timed call must not be
        # bit-identical to the warmup (bench.py integrity rules).
        warm = jax.device_put(
            np.arange(lo + iters, lo + 2 * iters, dtype=np.int32))
        idx = jax.device_put(np.arange(lo, lo + iters, dtype=np.int32))
        np.asarray(scan(dx, dw, warm))  # compile + warm this length
        t0 = time.perf_counter()
        np.asarray(scan(dx, dw, idx))
        return time.perf_counter() - t0

    del steps  # length is auto-calibrated
    return _calibrated(run, rt)


def _int8_weight_scan(fn, x, w, steps=64):
    """int8 variant: the weight perturbation must stay int8 — flip a
    carry-dependent sign on one column instead of scaling (distinct steps,
    still int8 MXU inputs)."""
    import jax
    import jax.numpy as jnp

    rt = _roundtrip_floor()

    @jax.jit
    def scan(x, w, idx):
        def body(carry, i):
            flip = ((i + carry) % 2).astype(jnp.int8)
            w_t = w.at[:, 0].multiply(jnp.where(flip > 0, -1, 1).astype(jnp.int8))
            y = fn(x, w_t)
            # FULL-output reduction: the first r4 run read y[:128, :1] and
            # XLA narrowed the whole matmul to one output column (measured
            # "1.5e9 TF/s").  Sum in int64-safe chunks via float64-free
            # modular arithmetic on int32 is overkill — a plain int32 sum
            # wraps, which is fine for a serialization token.
            return jnp.sum(y, dtype=jnp.int32) % 1024, 0
        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), idx)
        return tot

    dx, dw = jax.device_put(x), jax.device_put(w)

    def run(iters, lo):
        # Distinct warm vs timed idx ranges — see _time_scan_wperturb.
        warm = jax.device_put(
            np.arange(lo + iters, lo + 2 * iters, dtype=np.int32))
        idx = jax.device_put(np.arange(lo, lo + iters, dtype=np.int32))
        np.asarray(scan(dx, dw, warm))
        t0 = time.perf_counter()
        np.asarray(scan(dx, dw, idx))
        return time.perf_counter() - t0

    del steps
    return _calibrated(run, rt)


# ------------------------------------------------------------------ kernels
def _pallas_matmul(x, w, *, interpret=False):
    """M-tiled GEMM: A tiles stream HBM->VMEM (Mosaic grid pipelining),
    weights + output tile VMEM-resident, fp32 MXU accumulation."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    m, k = x.shape
    n = w.shape[1]

    def kernel(a_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], w_ref[:],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(m // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=x.dtype.itemsize * m * k + 2 * m * n + 2 * k * n,
            transcendentals=0),
        interpret=interpret,
    )(x, w)


def _pallas_matmul_int8(x, w, *, interpret=False):
    """int8 x int8 -> int32 MXU tiles (2x MXU rate, half the A bytes)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    m, k = x.shape
    n = w.shape[1]

    def kernel(a_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], w_ref[:],
                           preferred_element_type=jnp.int32)

    return pl.pallas_call(
        kernel,
        grid=(m // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k + 4 * m * n + k * n,
            transcendentals=0),
        interpret=interpret,
    )(x, w)


def _pallas_read_reduce(x, bias, *, interpret=False):
    """Bandwidth probe: read every A tile once, emit one 8x128 partial per
    tile (write traffic negligible) — achievable HBM GB/s for this pattern.

    ``bias`` is an (8, 128) f32 tile added to every partial.  It exists so
    the timing scan can thread its carry-perturbed weight INTO the kernel:
    without a per-step operand the reduction is loop-invariant and XLA
    hoists the whole pallas call out of the scan — the first r4 run of the
    carry-ignoring version recorded physically impossible bandwidths
    (9.5e6 GB/s in the superseded convfloor_r4.json read_bw rows)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    m, k = x.shape

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.sum(a_ref[:].astype(jnp.float32).reshape(
            TILE_M // 8, 8, k), axis=0)[:, :128] + b_ref[:]

    return pl.pallas_call(
        kernel,
        grid=(m // TILE_M,),
        in_specs=[pl.BlockSpec((TILE_M, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * (m // TILE_M), 128), jnp.float32),
        interpret=interpret,
    )(x, bias)


def _xla_matmul(x, w):
    import jax.numpy as jnp

    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(
        jnp.bfloat16)


def measure_shape(name, m, k, n, steps):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    x = (rng.standard_normal((m, k)) * 0.5).astype(np.float32)
    w = (rng.standard_normal((k, n)) * 0.1).astype(np.float32)
    xb, wb = jnp.bfloat16(x), jnp.bfloat16(w)
    xi = np.clip(np.round(x * 64), -127, 127).astype(np.int8)
    wi = np.clip(np.round(w * 127), -127, 127).astype(np.int8)
    flops = 2.0 * m * k * n
    out = {"m": m, "k": k, "n": n, "gflops": round(flops / 1e9, 2)}

    def tfs(secs):
        return round(flops / secs / 1e12, 1)

    s = _time_scan_wperturb(_xla_matmul, xb, wb, steps)
    out["xla_bf16"] = {"secs": s, "tflops_per_sec": tfs(s)}
    s = _time_scan_wperturb(_pallas_matmul, xb, wb, steps)
    out["pallas_bf16"] = {"secs": s, "tflops_per_sec": tfs(s)}

    import jax.lax as lax

    def xla_i8(a, b):
        return lax.dot(a, b, preferred_element_type=jnp.int32)

    s = _int8_weight_scan(xla_i8, xi, wi, steps)
    out["xla_int8"] = {"secs": s, "tflops_per_sec": tfs(s)}
    s = _int8_weight_scan(_pallas_matmul_int8, xi, wi, steps)
    out["pallas_int8"] = {"secs": s, "tflops_per_sec": tfs(s)}

    # Read-bandwidth roofline for this A (bf16 bytes; the dominant stream).
    # w_t (the carry-perturbed weight) MUST flow into the kernel: the
    # carry-ignoring first version was hoisted out of the scan by XLA and
    # recorded garbage (see _pallas_read_reduce docstring).
    def bw_fn(a, w_t):
        bias = jnp.full((8, 128), w_t[0].astype(jnp.float32), jnp.float32)
        return _pallas_read_reduce(a, bias)

    s = _time_scan_wperturb(bw_fn, xb, jnp.ones((1,), jnp.bfloat16), steps)
    gbps = (2.0 * m * k) / s / 1e9
    out["read_bw"] = {"secs": s, "gb_per_sec": round(gbps, 1),
                      "bw_roofline_tflops": tfs((2.0 * m * k) / (gbps * 1e9))}
    best = max(out[v]["tflops_per_sec"]
               for v in ("pallas_bf16", "pallas_int8"))
    out["best_pallas_over_xla_bf16"] = round(
        best / out["xla_bf16"]["tflops_per_sec"], 3)
    print(f"{name}: " + " ".join(
        f"{v}={out[v]['tflops_per_sec']}TF/s"
        for v in ("xla_bf16", "pallas_bf16", "xla_int8", "pallas_int8"))
        + f" read_bw={out['read_bw']['gb_per_sec']}GB/s"
        + f" best/xla={out['best_pallas_over_xla_bf16']}x", flush=True)
    return out


def parity_check(interpret=True):
    """Interpret-mode correctness of both kernels vs the XLA dot (run on CPU
    by tests; on TPU pass interpret=False to spot-check compiled output)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    x = rng.standard_normal((4096, 256)).astype(np.float32)
    w = rng.standard_normal((256, 64)).astype(np.float32)
    xb, wb = jnp.bfloat16(x), jnp.bfloat16(w)
    got = np.asarray(_pallas_matmul(xb, wb, interpret=interpret), np.float32)
    want = np.asarray(_xla_matmul(xb, wb), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    xi = np.clip(np.round(x * 16), -127, 127).astype(np.int8)
    wi = np.clip(np.round(w * 16), -127, 127).astype(np.int8)
    got = np.asarray(_pallas_matmul_int8(jnp.asarray(xi), jnp.asarray(wi),
                                         interpret=interpret))
    want = xi.astype(np.int32) @ wi.astype(np.int32)
    np.testing.assert_array_equal(got, want)
    xr = jnp.bfloat16(x[:2048 * 2])
    bias = jnp.full((8, 128), 2.5, jnp.float32)
    rr = np.asarray(_pallas_read_reduce(xr, bias, interpret=interpret))
    assert rr.shape == (16, 128) and np.all(np.isfinite(rr))
    # The bias operand must actually reach every partial (it is what makes
    # the timing scan's steps carry-dependent, i.e. non-hoistable).
    rr0 = np.asarray(_pallas_read_reduce(
        xr, jnp.zeros((8, 128), jnp.float32), interpret=interpret))
    np.testing.assert_allclose(rr - rr0, 2.5, rtol=0, atol=1e-5)
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--out", type=str, default="docs/convfloor_r4.json")
    p.add_argument("--parity_only", action="store_true",
                   help="interpret-mode kernel parity check (CPU-safe)")
    args = p.parse_args()
    if args.parity_only:
        import jax

        jax.config.update("jax_platforms", "cpu")
        parity_check()
        print("parity ok")
        return
    import jax

    results = {"device": jax.devices()[0].device_kind, "tile_m": TILE_M,
               "steps": args.steps, "shapes": {}}
    for name, s in SHAPES.items():
        results["shapes"][name] = measure_shape(name, steps=args.steps, **s)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
