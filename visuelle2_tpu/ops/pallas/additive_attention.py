"""Pallas TPU kernel: fused Bahdanau additive attention.

Fuses the whole additive-attention chain
(``/root/reference/models/CrossAttnRNN21.py:74-89``):

    h_j   = enc @ We                      (MXU)
    s_i   = dec @ Wd                      (MXU)
    e     = tanh(h_j + s_i) @ v + b       (VPU + MXU)
    alpha = softmax_L(e)                  (VPU)
    out   = alpha ⊙ base                  (VPU; base = enc or h_j)

into one VMEM-resident program per batch tile — no [B, L, A] energy/alpha
round-trips through HBM.  The XLA reference implementation is
``visuelle2_tpu.ops.attention.AdditiveAttention``; parity is enforced by
``tests/test_pallas_kernels.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(enc_ref, dec_ref, we_ref, wd_ref, v_ref, vb_ref, out_ref, alpha_ref,
            *, weight_on: str):
    TB, L, De = enc_ref.shape
    A = we_ref.shape[1]
    enc = enc_ref[:]
    h_j = jnp.dot(enc.reshape(TB * L, De), we_ref[:],
                  preferred_element_type=jnp.float32).reshape(TB, L, A)
    s_i = jnp.dot(dec_ref[:], wd_ref[:], preferred_element_type=jnp.float32)
    t = jnp.tanh(h_j + s_i[:, None, :])
    e = jnp.dot(t.reshape(TB * L, A), v_ref[:],
                preferred_element_type=jnp.float32).reshape(TB, L) + vb_ref[0]
    alpha = jax.nn.softmax(e, axis=1)
    base = enc if weight_on == "inputs" else h_j
    out_ref[:] = (alpha[..., None] * base).astype(out_ref.dtype)
    alpha_ref[:] = alpha.astype(alpha_ref.dtype)


@functools.partial(jax.jit, static_argnames=("weight_on", "block_b", "interpret"))
def fused_additive_attention(encoder_out, decoder_hidden, we, wd, v, vb, *,
                             weight_on: str = "inputs", block_b: int = 64,
                             interpret: bool = False):
    """encoder_out [B, L, De], decoder_hidden [B, Dd], We [De, A], Wd [Dd, A],
    v [A, 1], vb [1] -> (weighted [B, L, Dw], alpha [B, L]).

    The batch tile auto-sizes to the VMEM budget: per row the kernel holds the
    enc block, the h_j/tanh scratch and the output block (~L·(De+2A+Dw)·4 B),
    plus the weight matrices; blocks are pipelined double-buffered, so target
    well under the 16 MB scoped limit (production dims De=A=512, L=52 OOM'd
    the fixed tile on v5e).
    """
    B, L, De = encoder_out.shape
    A = we.shape[1]
    Dw = De if weight_on == "inputs" else A

    weight_bytes = (De * A + wd.shape[0] * A) * 4
    per_row = L * (De + 2 * A + Dw) * 4
    budget = 10 * 2 ** 20 - weight_bytes  # leave headroom for double buffers
    auto_tb = max(8, min(block_b, budget // max(per_row, 1)))
    auto_tb = (auto_tb // 8) * 8 or 8
    tb = min(auto_tb, B)
    pad = (-B) % tb
    if pad:
        encoder_out = jnp.pad(encoder_out, ((0, pad), (0, 0), (0, 0)))
        decoder_hidden = jnp.pad(decoder_hidden, ((0, pad), (0, 0)))
    Bp = B + pad

    out, alpha = pl.pallas_call(
        functools.partial(_kernel, weight_on=weight_on),
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, L, De), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, decoder_hidden.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((De, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wd.shape[0], A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, L, Dw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, L, Dw), encoder_out.dtype),
            jax.ShapeDtypeStruct((Bp, L), encoder_out.dtype),
        ),
        interpret=interpret,
    )(encoder_out, decoder_hidden, we, wd, v, vb)
    return out[:B], alpha[:B]
