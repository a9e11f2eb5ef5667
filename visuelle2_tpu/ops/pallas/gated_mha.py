"""Pallas TPU kernel: fused multi-head attention with the v2 gated epilogues.

SURVEY.md §2.4 item 2: the reference's ``nn.MultiheadAttention`` call sites
(``/root/reference/models/Proposed_model_v2.py:546-602`` pure-gated,
``:643-690`` head-specific) become ONE VMEM-resident program per batch tile:

    q, k, v = x @ Wq + bq, ...                    (MXU)
    probs   = softmax(q·kᵀ·scale + mask)          (MXU + VPU)
    ctx     = probs @ v                           (MXU)
    pure:   y = (merge(ctx) ⊙ σ(query @ Wg + bg)) @ Wo + bo
    head:   y = merge(ctx ⊙ σ(q_h @ Wg + bg)) @ Wo + bo

No [B, h, L, L] probability or [B, L, D] intermediate round-trips through
HBM.  Sequences here are tiny (L ≤ 52) so whole rows live in VMEM; the grid
tiles the batch.  The XLA reference implementations are
``ops.attention.PureGatedMultiHeadAttention`` / ``HeadSpecificGatedAttention``;
parity is enforced by ``tests/test_pallas_kernels.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, mask_ref,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wg_ref, bg_ref, wo_ref, bo_ref, out_ref,
            *, num_heads: int, variant: str):
    TB, Lq, D = q_ref.shape
    Lk = k_ref.shape[1]
    h = num_heads
    d = D // h

    query = q_ref[:]
    q = (jnp.dot(query.reshape(TB * Lq, D), wq_ref[:],
                 preferred_element_type=jnp.float32) + bq_ref[:])
    k = (jnp.dot(k_ref[:].reshape(TB * Lk, D), wk_ref[:],
                 preferred_element_type=jnp.float32) + bk_ref[:])
    v = (jnp.dot(v_ref[:].reshape(TB * Lk, D), wv_ref[:],
                 preferred_element_type=jnp.float32) + bv_ref[:])
    qh = q.reshape(TB, Lq, h, d).transpose(0, 2, 1, 3)
    kh = k.reshape(TB, Lk, h, d).transpose(0, 2, 1, 3)
    vh = v.reshape(TB, Lk, h, d).transpose(0, 2, 1, 3)

    scores = jax.lax.dot_general(
        qh, kh, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32) * (d ** -0.5)
    scores = scores + mask_ref[:][None, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jax.lax.dot_general(
        probs, vh, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)  # [TB, h, Lq, d]

    if variant == "head":
        # Per-head gate from the projected per-head query (v2:643-690).
        g = jax.nn.sigmoid(
            jax.lax.dot_general(qh, wg_ref[:], (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + bg_ref[:])
        merged = (ctx * g).transpose(0, 2, 1, 3).reshape(TB * Lq, D)
    else:  # pure: post-concat gate from the raw query (v2:546-602).
        g = jax.nn.sigmoid(
            jnp.dot(query.reshape(TB * Lq, D), wg_ref[:],
                    preferred_element_type=jnp.float32) + bg_ref[:])
        merged = ctx.transpose(0, 2, 1, 3).reshape(TB * Lq, D) * g

    y = (jnp.dot(merged, wo_ref[:], preferred_element_type=jnp.float32)
         + bo_ref[:])
    out_ref[:] = y.reshape(TB, Lq, D).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "variant",
                                             "block_b", "interpret"))
def fused_gated_mha(query, key, value, mask,
                    wq, bq, wk, bk, wv, bv, wg, bg, wo, bo, *,
                    num_heads: int, variant: str = "pure",
                    block_b: int = 128, interpret: bool = False):
    """query [B, Lq, D], key/value [B, Lk, D], mask [Lq, Lk] additive (pass
    zeros for no mask); weights are the Dense trees of the XLA modules
    (kernel [in, out], bias [out]); gate: pure -> Wg [D, D], head -> Wg
    [d, d] per-head.  Returns [B, Lq, D]."""
    B, Lq, D = query.shape
    Lk = key.shape[1]

    # VMEM budget per batch row: q/k/v blocks + f32 projections + probs.
    h = num_heads
    per_row = (Lq * D * 3 + Lk * D * 2 + h * Lq * Lk + Lq * D * 2) * 4
    weight_bytes = (4 * D * D + wg.size) * 4
    budget = 10 * 2 ** 20 - weight_bytes
    tb = max(8, min(block_b, budget // max(per_row, 1)))
    tb = (tb // 8) * 8 or 8
    tb = min(tb, B)
    pad = (-B) % tb
    if pad:
        query = jnp.pad(query, ((0, pad), (0, 0), (0, 0)))
        key = jnp.pad(key, ((0, pad), (0, 0), (0, 0)))
        value = jnp.pad(value, ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad

    full = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, variant=variant),
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, Lq, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, Lk, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, Lk, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full(Lq, Lk),
            full(D, D), full(D), full(D, D), full(D), full(D, D), full(D),
            full(*wg.shape), full(*bg.shape), full(D, D), full(D),
        ],
        out_specs=pl.BlockSpec((tb, Lq, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Lq, D), query.dtype),
        interpret=interpret,
    )(query, key, value, mask, wq, bq, wk, bk, wv, bv, wg, bg, wo, bo)
    return out[:B]
