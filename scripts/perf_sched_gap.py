"""Bounded probe of the 4.9 ms backbone "scheduling gap" (VERDICT r4 #3).

Round 4 measured the ResNet-101 @299 batch-128 backbone at 29.18 ms vs a
24.28 ms sum of isolated convs (docs/RESULTS_r4.md §d) and attributed the
difference to "residual adds, maxpool, relayouts, scheduling" without a
probe.  Hypothesis tested here: the gap is mostly the **residual-skip HBM
traffic the sum-of-isolated-convs accounting omits** — every identity
bottleneck must re-read its block input (the skip tensor) from HBM for the
final add, ~3.5 GB/batch across the 29 identity blocks, ≈4.3 ms at the
chip's streaming bandwidth.  That would make the gap mandatory memory
traffic (architecture physics), not attackable scheduling slack.

Probes (all on random weights — timing only):

1. ``stream``    — bf16 triad bandwidth (read+write) on a 256 MB array.
2. ``full``      — the real backbone, one jitted scan.
3. ``noskip``    — SAME convs/BNs/ReLUs, identity-block skip adds removed
                   (downsample-block adds kept: their ds_conv is part of the
                   conv-sum accounting).  full − noskip ≈ identity-skip cost.
4. ``stem`` / ``stem_pool`` — conv1+BN+ReLU without/with maxpool
                   (isolates the maxpool).
5. ``stage1..4`` — each stage alone on its real input shape: localizes any
                   remaining gap (relayouts would concentrate at the narrow
                   early stages).

Methodology per CLAUDE.md benchmark integrity + the r4 convfloor lessons:
weight-perturb carries (the probe perturbs the kernels every consumer of
the loop-invariant input reads, so nothing hoists and input traffic stays
realistic — input-perturb carries were the r3 artifact), distinct
warm-vs-timed seed streams, host-fetch barrier, measured round-trip floor
subtracted, auto-calibrated scan lengths, and cost_analysis FLOPs recorded
per probe as the DCE guard (noskip must match full; stages must sum to it).

    python scripts/perf_sched_gap.py [--out docs/schedgap_r5.json]
    python scripts/perf_sched_gap.py --smoke   # CPU harness check
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

from perf_roofline import _roundtrip_floor  # noqa: E402

BATCH, IMAGE, ARCH = 128, 299, "resnet101"


def _perturb(variables, leaf_paths, s):
    """Multiply the named kernel leaves by (1 + s*1e-9): every step's
    dispatch differs through weights, input traffic untouched."""
    import jax

    v = jax.tree_util.tree_map(lambda a: a, variables)  # shallow-ish copy
    params = dict(v["params"])
    for path in leaf_paths:
        node = params
        *parents, leaf = path
        trail = []
        for p in parents:
            node[p] = dict(node[p])
            trail.append(node)
            node = node[p]
        node[leaf] = dict(node[leaf])
        node[leaf]["kernel"] = node[leaf]["kernel"] * (1.0 + s * 1e-9)
    v = dict(v)
    v["params"] = params
    return v


def _time_probe(apply_fn, variables, x_const, leaf_paths, *, rt, tag,
                min_device_s=1.0, probe_iters=8, max_iters=512):
    """secs/step + cost_analysis flops/step for ``apply_fn(variables, x)``
    under a weight-perturb lax.scan."""
    import jax
    import jax.numpy as jnp

    def scan_fn(v, x, seeds):
        def body(carry, s):
            vp = _perturb(v, leaf_paths, s + carry * 1e-20)
            y = apply_fn(vp, x)
            return jnp.mean(y).astype(jnp.float32), 0
        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), seeds)
        return tot

    jfn = jax.jit(scan_fn)
    dx = jax.device_put(x_const)
    dv = jax.device_put(variables)

    def run(n, seed0):
        seeds = jnp.asarray(
            np.random.default_rng(seed0).uniform(1.0, 2.0, n)
            .astype(np.float32))
        t0 = time.perf_counter()
        np.asarray(jfn(dv, dx, seeds))
        return time.perf_counter() - t0

    run(probe_iters, 1)                      # compile + warm (distinct seeds)
    est = max(run(probe_iters, 2) - rt, 1e-6) / probe_iters
    iters = int(min(max_iters, max(probe_iters, np.ceil(min_device_s / est))))
    # A new scan length is a new XLA program: warm ONCE at the final length
    # so the timed run contains zero compile time (the first r5 run skipped
    # this and reported compile-contaminated times, e.g. full at 306 ms/step
    # vs the known 29.8 ms backbone).
    run(iters, 3)
    secs = max(run(iters, 4) - rt, 1e-9) / iters

    lowered = jfn.lower(dv, dx, jnp.zeros((iters,), jnp.float32))
    cost = lowered.compile().cost_analysis()
    # cost_analysis counts a lax.scan body ONCE (verified: full/noskip
    # totals are identical and equal one batch's FLOPs), so the body cost
    # IS the per-step cost — no division by iters.
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    print(f"[{tag}] {secs * 1e3:.3f} ms/step (iters={iters}, "
          f"{flops / 1e9:.1f} GFLOP/step)", flush=True)
    return secs, flops, iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/schedgap_r5.json")
    ap.add_argument("--smoke", action="store_true")
    opts = ap.parse_args()

    global BATCH, IMAGE, ARCH
    if opts.smoke:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        BATCH, IMAGE, ARCH = 4, 64, "tiny"

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from visuelle2_tpu.models import resnet

    dtype = jnp.bfloat16
    blocks = resnet.STAGE_BLOCKS[ARCH]
    rt = _roundtrip_floor()
    print(f"rt floor {rt * 1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)
    res = {"device": jax.devices()[0].device_kind, "batch": BATCH,
           "image": IMAGE, "arch": ARCH, "rt_floor_ms": round(rt * 1e3, 2),
           "probes": {}}

    def record(tag, secs, flops, iters, extra=None):
        res["probes"][tag] = dict({"ms": round(secs * 1e3, 3),
                                   "gflops": round(flops / 1e9, 2),
                                   "iters": iters}, **(extra or {}))

    # ---- 1. streaming bandwidth: the ARRAY is the scan carry, so every
    # step must read it and write the update (2x bytes; a scalar-carry
    # formulation would let XLA fuse the whole body into a read-only
    # reduction and fake 2x the bandwidth).
    n_bytes = 256 << 20 if not opts.smoke else 1 << 20
    x0 = jnp.asarray(rng.standard_normal(n_bytes // 2).astype(np.float32),
                     dtype)

    @jax.jit
    def stream_scan(x, seeds):
        def body(c, s):
            return ((c * (1.0 + s * 1e-9) + 1e-9).astype(c.dtype)), 0
        y, _ = jax.lax.scan(body, x, seeds)
        return jnp.mean(y)

    dx0 = jax.device_put(x0)

    def stream_run(n, seed0):
        seeds = jnp.asarray(np.random.default_rng(seed0)
                            .uniform(1.0, 2.0, n).astype(np.float32))
        t0 = time.perf_counter()
        np.asarray(stream_scan(dx0, seeds))
        return time.perf_counter() - t0

    stream_run(8, 1)
    est = max(stream_run(8, 2) - rt, 1e-6) / 8
    it = int(min(512, max(8, np.ceil(1.0 / est))))
    stream_run(it, 3)                        # compile at the final length
    s_tri = max(stream_run(it, 4) - rt, 1e-9) / it
    stream_gbs = 2 * n_bytes / s_tri / 1e9
    print(f"[stream] {s_tri * 1e3:.3f} ms/step ({stream_gbs:.0f} GB/s)",
          flush=True)
    record("stream", s_tri, 0.0, it, {"gb_per_s": round(stream_gbs, 1)})

    # ---- 2/3. full backbone vs no-skip variant.
    x_img = jnp.asarray(rng.standard_normal(
        (BATCH, IMAGE, IMAGE, 3)).astype(np.float32), dtype)
    backbone = resnet.ResNetBackbone(blocks=blocks, dtype=dtype)
    v_full = backbone.init(jax.random.key(0), x_img)

    class NoSkipBottleneck(resnet.Bottleneck):
        """Bottleneck minus the identity-skip add (downsample adds kept:
        ds_conv belongs to the conv-sum accounting)."""

        @nn.compact
        def __call__(self, x, train: bool = False):
            ura = not train
            out = resnet._conv(self.features, 1, 1, "conv1", self.dtype)(x)
            out = resnet.BatchNorm(self.features, self.dtype, name="bn1")(
                out, use_running_average=ura)
            out = nn.relu(out)
            out = resnet._conv(self.features, 3, self.stride, "conv2",
                               self.dtype)(out)
            out = resnet.BatchNorm(self.features, self.dtype, name="bn2")(
                out, use_running_average=ura)
            out = nn.relu(out)
            out = resnet._conv(self.features * 4, 1, 1, "conv3",
                               self.dtype)(out)
            out = resnet.BatchNorm(self.features * 4, self.dtype,
                                   name="bn3")(out, use_running_average=ura)
            if self.downsample:
                sc = resnet._conv(self.features * 4, 1, self.stride,
                                  "ds_conv", self.dtype)(x)
                sc = resnet.BatchNorm(self.features * 4, self.dtype,
                                      name="ds_bn")(
                    sc, use_running_average=ura)
                return nn.relu(out + sc)
            return nn.relu(out)

    orig = resnet.Bottleneck
    resnet.Bottleneck = NoSkipBottleneck
    try:
        noskip = resnet.ResNetBackbone(blocks=blocks, dtype=dtype)
        v_noskip = noskip.init(jax.random.key(0), x_img)
    finally:
        resnet.Bottleneck = orig

    stem_leaf = [("conv1",)]
    s_full, f_full, it = _time_probe(
        lambda v, x: backbone.apply(v, x, train=False), v_full, x_img,
        stem_leaf, rt=rt, tag="full")
    record("full", s_full, f_full, it)
    s_ns, f_ns, it = _time_probe(
        lambda v, x: noskip.apply(v, x, train=False), v_noskip, x_img,
        stem_leaf, rt=rt, tag="noskip")
    record("noskip", s_ns, f_ns, it)

    # ---- 4. stem without/with maxpool.
    class Stem(nn.Module):
        pool: bool

        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        dtype=dtype, name="conv1")(x)
            x = resnet.BatchNorm(64, dtype, name="bn1")(
                x, use_running_average=True)
            x = nn.relu(x)
            if self.pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)])
            return x

    for tag, pool in (("stem", False), ("stem_pool", True)):
        m = Stem(pool=pool)
        v = m.init(jax.random.key(0), x_img)
        s, f, it = _time_probe(lambda vv, x, m=m: m.apply(vv, x), v, x_img,
                               stem_leaf, rt=rt, tag=tag)
        record(tag, s, f, it)

    # ---- 5. per-stage attribution on real input shapes.
    side = IMAGE // 4 + (1 if IMAGE % 4 else 0)  # after stem+pool
    widths = (64, 128, 256, 512)
    cin = 64
    for stage, (n_blocks, w) in enumerate(zip(blocks, widths)):
        class Stage(nn.Module):
            idx: int
            nb: int
            width: int

            @nn.compact
            def __call__(self, x):
                for b in range(self.nb):
                    stride = 2 if (self.idx > 0 and b == 0) else 1
                    x = resnet.Bottleneck(
                        self.width, stride=stride, downsample=(b == 0),
                        dtype=dtype, name=f"layer{self.idx + 1}_{b}")(
                        x, False)
                return x

        x_in = jnp.asarray(rng.standard_normal(
            (BATCH, side, side, cin)).astype(np.float32), dtype)
        m = Stage(idx=stage, nb=n_blocks, width=w)
        v = m.init(jax.random.key(0), x_in)
        # Perturb BOTH consumers of the loop-invariant stage input (conv1
        # and ds_conv of block 0) so nothing hoists out of the scan.
        leaves = [(f"layer{stage + 1}_0", "conv1"),
                  (f"layer{stage + 1}_0", "ds_conv")]
        s, f, it = _time_probe(lambda vv, x, m=m: m.apply(vv, x), v, x_in,
                               leaves, rt=rt, tag=f"stage{stage + 1}")
        record(f"stage{stage + 1}", s, f, it,
               {"in_shape": [BATCH, side, side, cin]})
        if stage > 0:
            side = side // 2 + side % 2
        cin = w * 4
    # NOTE: the stage input sides follow conv stride arithmetic
    # (299 -> 150 -> 75 -> 38 -> 19 -> 10); stage k>=1 downsamples on entry,
    # so its INPUT side is the previous stage's output side.

    # ---- analysis: identity-skip traffic model.
    side = IMAGE // 4 + (1 if IMAGE % 4 else 0)
    skip_bytes = 0
    sides = []
    for stage, (n_blocks, w) in enumerate(zip(blocks, widths)):
        if stage > 0:
            side = side // 2 + side % 2
        sides.append(side)
        skip_bytes += (n_blocks - 1) * BATCH * side * side * w * 4 * 2
    gap_ms = (res["probes"]["full"]["ms"] - res["probes"]["noskip"]["ms"])
    pred_ms = skip_bytes / (stream_gbs * 1e9) * 1e3
    stage_sum = sum(res["probes"][f"stage{k}"]["ms"] for k in range(1, 5))
    res["analysis"] = {
        "identity_skip_read_gb": round(skip_bytes / 1e9, 3),
        "skip_model_ms_at_stream_bw": round(pred_ms, 2),
        "measured_full_minus_noskip_ms": round(gap_ms, 2),
        "maxpool_ms": round(res["probes"]["stem_pool"]["ms"]
                            - res["probes"]["stem"]["ms"], 3),
        "stempool_plus_stages_ms": round(
            res["probes"]["stem_pool"]["ms"] + stage_sum, 2),
        "full_ms": res["probes"]["full"]["ms"],
    }
    print(json.dumps(res["analysis"], indent=1), flush=True)
    with open(opts.out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"-> {opts.out}", flush=True)


if __name__ == "__main__":
    main()
