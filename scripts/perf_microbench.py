"""Micro-benchmarks on the real TPU chip: what speedup is actually on the
table for (a) int8 convolution vs bf16, (b) XLA scheduling flags.

Relay-safe methodology: one jitted lax.scan over distinct inputs, carry
serializes steps, host fetch is the barrier (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 8


def _time_scan(fn, stacks):
    """fn(x_t) -> array; stacks = (warm, timed) each [ITERS, ...]."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def scan(stack):
        def body(c, x):
            y = fn(x)
            return c + jnp.sum(y.astype(jnp.float32)), ()
        tot, _ = jax.lax.scan(body, jnp.zeros(()), stack)
        return tot

    warm, timed = stacks
    np.asarray(scan(warm))
    t0 = time.perf_counter()
    np.asarray(scan(timed))
    return (time.perf_counter() - t0) / ITERS


def conv_bench():
    """ResNet-101 layer3-representative conv: 3x3, 256ch, 19x19 spatial,
    in bf16 vs int8 (int32 accumulate); shapes sized for the tunnel."""
    import jax
    import jax.numpy as jnp

    B, H, W, C = 64, 19, 19, 256
    rng = np.random.default_rng(0)
    k_bf = jnp.asarray(rng.standard_normal((3, 3, C, C)), jnp.bfloat16)
    k_i8 = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)
    dn = jax.lax.conv_dimension_numbers((B, H, W, C), (3, 3, C, C),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv_bf16(x):
        return jax.lax.conv_general_dilated(
            x, k_bf, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    def conv_int8(x):
        return jax.lax.conv_general_dilated(
            x, k_i8, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    x_bf = [jnp.asarray(rng.standard_normal((ITERS, B, H, W, C)), jnp.bfloat16)
            for _ in range(2)]
    x_i8 = [jnp.asarray(rng.integers(-127, 127, (ITERS, B, H, W, C)), jnp.int8)
            for _ in range(2)]
    flops = 2 * B * H * W * C * C * 9
    t_bf = _time_scan(conv_bf16, x_bf)
    t_i8 = _time_scan(conv_int8, x_i8)
    print(json.dumps({"bench": "conv3x3_256ch_19sp",
                      "bf16_tflops": round(flops / t_bf / 1e12, 1),
                      "int8_tops": round(flops / t_i8 / 1e12, 1),
                      "int8_speedup": round(t_bf / t_i8, 2)}), flush=True)

    # Big-spatial early conv (layer1-representative): 3x3 64ch 75x75
    B2, H2, W2, C2 = 32, 75, 75, 64
    kb = jnp.asarray(rng.standard_normal((3, 3, C2, C2)), jnp.bfloat16)
    ki = jnp.asarray(rng.integers(-127, 127, (3, 3, C2, C2)), jnp.int8)
    dn2 = jax.lax.conv_dimension_numbers((B2, H2, W2, C2), (3, 3, C2, C2),
                                         ("NHWC", "HWIO", "NHWC"))

    def c_bf(x):
        return jax.lax.conv_general_dilated(
            x, kb, (1, 1), "SAME", dimension_numbers=dn2,
            preferred_element_type=jnp.float32)

    def c_i8(x):
        return jax.lax.conv_general_dilated(
            x, ki, (1, 1), "SAME", dimension_numbers=dn2,
            preferred_element_type=jnp.int32)

    xb = [jnp.asarray(rng.standard_normal((ITERS, B2, H2, W2, C2)), jnp.bfloat16)
          for _ in range(2)]
    xi = [jnp.asarray(rng.integers(-127, 127, (ITERS, B2, H2, W2, C2)), jnp.int8)
          for _ in range(2)]
    flops2 = 2 * B2 * H2 * W2 * C2 * C2 * 9
    tb2, ti2 = _time_scan(c_bf, xb), _time_scan(c_i8, xi)
    print(json.dumps({"bench": "conv3x3_64ch_75sp",
                      "bf16_tflops": round(flops2 / tb2 / 1e12, 1),
                      "int8_tops": round(flops2 / ti2 / 1e12, 1),
                      "int8_speedup": round(tb2 / ti2, 2)}), flush=True)


if __name__ == "__main__":
    conv_bench()
