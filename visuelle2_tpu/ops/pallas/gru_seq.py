"""Pallas TPU kernel: fused GRU sequence.

The GRU's input-side matmuls are hoisted outside (one large ``[B·T, I] @
[I, 3H]`` MXU GEMM); this kernel runs only the inherently sequential part —
the hidden-state recurrence — with ``h`` and ``W_h`` pinned in VMEM for the
whole sequence, so each step is one ``[TB, H] @ [H, 3H]`` MXU matmul plus the
VPU gate epilogue, and ``h`` never round-trips through HBM between steps.

Replaces the cuDNN GRU the reference relies on
(``/root/reference/models/CrossAttnRNN210.py:123,135``).  The XLA reference is
``visuelle2_tpu.ops.gru.GRU`` (lax.scan); parity tested in
``tests/test_pallas_kernels.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(gi_ref, wh_ref, bh_ref, h0_ref, out_ref, hT_ref):
    TB, T, H3 = gi_ref.shape
    H = H3 // 3

    def step(t, h):
        gh = jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32) + bh_ref[:]
        gi = gi_ref[:, t, :]
        r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
        h = (1.0 - z) * n + z * h
        out_ref[:, t, :] = h.astype(out_ref.dtype)
        return h

    h = jax.lax.fori_loop(0, T, step, h0_ref[:].astype(jnp.float32))
    hT_ref[:] = h.astype(hT_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_gru_sequence(x, w_i, w_h, b_i, b_h, h0=None, *, block_b: int = 128,
                       interpret: bool = False):
    """x [B, T, I] -> (outputs [B, T, H], h_T [B, H]); torch GRU weight layout
    (gate order r, z, n) identical to ``ops.gru.GRU``."""
    B, T, I = x.shape
    H = w_h.shape[0]
    # Input-side projection as one big GEMM outside the kernel.
    gi = (x.reshape(B * T, I) @ w_i + b_i).reshape(B, T, 3 * H)
    if h0 is None:
        h0 = jnp.zeros((B, H), x.dtype)

    tb = min(block_b, B)
    pad = (-B) % tb
    if pad:
        gi = jnp.pad(gi, ((0, pad), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
    Bp = B + pad

    out, hT = pl.pallas_call(
        _kernel,
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, T, 3 * H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * H,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, T, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, T, H), x.dtype),
            jax.ShapeDtypeStruct((Bp, H), x.dtype),
        ),
        interpret=interpret,
    )(gi, w_h, b_h, h0)
    return out[:B], hT[:B]
