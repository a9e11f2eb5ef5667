"""Backbone-only isolation: where do the model's 30 ms/batch actually go?

Three-way attribution for the gated_v4 eval step (batch 128, ResNet-101
@299, bf16):

    model total (bench.py / dedup dup1)          ~30 ms
    backbone-only (THIS script)                   ?
    corrected per-shape conv sum (convfloor_v2)   ?

If backbone-only ~= the corrected conv sum, the backbone is at its roofline
and the model-vs-backbone delta is the heads (trend transformer, fusion,
decoder) + normalize.  If backbone-only >> conv sum, the gap is inter-layer
(BN/relu passes not fused into convs, residual adds, maxpool, layout
transitions) — attackable with eval-time BN folding / fused kernels.

Methodology (CLAUDE.md benchmark integrity): ONE jitted lax.scan over a
stack of DISTINCT per-step uint8 image batches (as in bench.py), the carry
folded into the normalized input so steps serialize; host fetch barrier;
measured dispatch floor subtracted.  Also times the normalize alone (same
harness, backbone skipped) so the backbone number can be quoted net of it.

    python scripts/perf_backbone_isolation.py --out docs/backbone_iso_r4.json
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

BATCH = 128
IMAGE = 299
ARCH = "resnet101"


def _time_image_scan(body_fn, iters, seed0=0):
    """secs/step for ``body_fn(x_norm)`` over distinct per-step uint8 image
    batches; the carry perturbs the normalized input (serialized steps)."""
    import jax
    import jax.numpy as jnp

    from visuelle2_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD

    rt = _roundtrip_floor()
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    @jax.jit
    def scan(stack):
        def body(carry, img_u8):
            x = (img_u8.astype(jnp.float32) / 255.0 - mean) / std
            x = x * (1.0 + carry * 1e-6)
            y = body_fn(x.astype(jnp.bfloat16))
            return jnp.mean(y).astype(jnp.float32), 0
        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), stack)
        return tot

    rng = np.random.default_rng(seed0)
    stack = rng.integers(0, 256, (iters, BATCH, IMAGE, IMAGE, 3),
                         dtype=np.uint8)
    # Warm on a DISTINCT stack (same shape -> same program): the relay
    # dedupes identical dispatches, so the timed dispatch must not be
    # bit-identical to the warmup (bench.py integrity rules).  The warm
    # stack is dropped before timing to keep the footprint one stack.
    warm = jax.device_put(rng.integers(
        0, 256, (iters, BATCH, IMAGE, IMAGE, 3), dtype=np.uint8))
    np.asarray(scan(warm))  # compile + warm
    del warm
    d = jax.device_put(stack)
    t0 = time.perf_counter()
    np.asarray(scan(d))
    return max(time.perf_counter() - t0 - rt, 1e-9) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/backbone_iso_r4.json")
    ap.add_argument("--iters", type=int, default=40,
                    help="scan length (40 x ~34 MB uint8 ~ 1.4 GB on device)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny arch/image/batch on CPU (harness check only)")
    opts = ap.parse_args()

    global BATCH, IMAGE, ARCH
    if opts.smoke:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        BATCH, IMAGE, ARCH, opts.iters = 4, 32, "tiny", 3

    import jax
    import jax.numpy as jnp

    from visuelle2_tpu.models.resnet import ResNetBackbone, STAGE_BLOCKS

    backbone = ResNetBackbone(blocks=STAGE_BLOCKS[ARCH],
                              dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x0 = jnp.bfloat16(rng.standard_normal(
        (BATCH, IMAGE, IMAGE, 3)).astype(np.float32))
    variables = jax.device_put(backbone.init(jax.random.key(0), x0))

    s_norm = _time_image_scan(lambda x: x, opts.iters, seed0=1)
    s_full = _time_image_scan(
        lambda x: backbone.apply(variables, x, train=False),
        opts.iters, seed0=2)

    res = {
        "device": jax.devices()[0].device_kind,
        "batch": BATCH, "image": IMAGE, "iters": opts.iters,
        "normalize_only_ms": round(s_norm * 1e3, 3),
        "normalize_plus_backbone_ms": round(s_full * 1e3, 3),
        "backbone_net_ms": round((s_full - s_norm) * 1e3, 3),
    }
    print(json.dumps(res), flush=True)
    with open(opts.out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"-> {opts.out}")


if __name__ == "__main__":
    main()
