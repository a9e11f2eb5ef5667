"""Pallas TPU kernel: fused context-conditioned gated residual.

Covers every gate pattern in the Proposed models with one primitive:

    g   = σ(x @ Wx + ctx @ Wc + b)
    out = x + x ⊙ g          (soft residual gate)

* v1 ``GatedResidualBlock`` (``Proposed_model.py:141-154``): ctx absent
  (Wc zero-width), caller LayerNorms after.
* v2 ``PureGatedFusionNetwork`` (``Proposed_model_v2.py:604-637``): x = full
  concat, ctx absent, bias initialized +2.0 by the module.
* v3 TARG gates (``Proposed_model_v3.py:187-229``): gate from concat[Q; C] is
  exactly ``C @ Wx + Q @ Wc`` with the weight matrix split; pure-gate output
  (no residual) obtained by ``residual=False``.
* v4 TG-Fusion (``Proposed_model_v4.py:182-193``): x = image/temporal, ctx =
  flattened text.

Fusion keeps the (often 6·E-wide) concat activations in VMEM; the two matmuls
feed the MXU back-to-back and the sigmoid/multiply/add epilogue never touches
HBM.  XLA reference implementations live in ``visuelle2_tpu.models.fusion``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, ctx_ref, wx_ref, wc_ref, b_ref, out_ref, *, residual: bool):
    x = x_ref[:]
    logits = jnp.dot(x, wx_ref[:], preferred_element_type=jnp.float32)
    logits = logits + jnp.dot(ctx_ref[:], wc_ref[:],
                              preferred_element_type=jnp.float32)
    g = jax.nn.sigmoid(logits + b_ref[:])
    gated = x.astype(jnp.float32) * g
    out = x + gated if residual else gated
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("residual", "block_b", "interpret"))
def fused_gated_residual(x, ctx, wx, wc, b, *, residual: bool = True,
                         block_b: int = 128, interpret: bool = False):
    """x [B, D], ctx [B, C], Wx [D, D], Wc [C, D], b [D] ->
    ``x + x·σ(xWx + ctxWc + b)`` (or the pure gate with residual=False)."""
    B, D = x.shape
    C = ctx.shape[1]
    tb = min(block_b, B)
    pad = (-B) % tb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        ctx = jnp.pad(ctx, ((0, pad), (0, 0)))
    Bp = B + pad

    out = pl.pallas_call(
        functools.partial(_kernel, residual=residual),
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, D), x.dtype),
        interpret=interpret,
    )(x, ctx, wx, wc, b)
    return out[:B]
