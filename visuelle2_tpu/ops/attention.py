"""Attention modules: additive (Bahdanau), multi-head, and the gated variants.

Reference counterparts:

* ``AdditiveAttention`` — two weighting variants exist in the reference:
  weights applied to the *raw encoder output* (``CrossAttnRNN21.py:88``) vs to
  the *projected* ``h_j`` (``CrossAttnRNNDemand.py:145-147``).  Both are
  supported via ``weight_on``.
* ``MultiHeadAttention`` — torch ``nn.MultiheadAttention`` semantics
  (joint QKV projections + out projection, dropout on attention probs), but
  batch-first ``[B, L, D]`` — the natural TPU layout.
* ``PureGatedMultiHeadAttention`` — v2's post-concat gating with +2.0 bias
  init (``Proposed_model_v2.py:546-602``).
* ``HeadSpecificGatedAttention`` — v2's per-head gate on ``head_dim``
  (``Proposed_model_v2.py:643-690``).
* ``GatedCrossAttention`` — v1's query-gated standard MHA
  (``Proposed_model.py:194-224``).

Hot paths have Pallas-fused equivalents in ``visuelle2_tpu.ops.pallas``;
these XLA versions are the reference implementations used for parity tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class _Weights(nn.Module):
    """Parameter-only child module giving Dense-compatible trees
    ({name: {kernel[, bias]}}) usable by both the XLA and Pallas paths."""

    shape: tuple
    use_bias: bool = False
    bias_init: float = 0.0

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = (self.param("bias", nn.initializers.constant(self.bias_init),
                        (self.shape[-1],))
             if self.use_bias else None)
        return k, b


class AdditiveAttention(nn.Module):
    """Bahdanau additive attention.

    energy = v·tanh(W_e·enc + W_d·dec);  alpha = softmax(energy over len);
    returns (alpha-weighted encoding [B, L, D_w], alpha [B, L]).

    ``use_pallas=True`` routes through the fused TPU kernel
    (``ops/pallas/additive_attention.py``) with the identical parameter tree.
    """

    attention_dim: int
    weight_on: str = "inputs"  # "inputs" (CrossAttnRNN21.py:88) | "projected" (Demand:146)
    use_pallas: bool = False

    @nn.compact
    def __call__(self, encoder_out, decoder_hidden):
        # encoder_out: [B, L, De]; decoder_hidden: [B, Dd]
        A = self.attention_dim
        we, _ = _Weights((encoder_out.shape[-1], A), name="encoder_linear")()
        wd, _ = _Weights((decoder_hidden.shape[-1], A), name="decoder_linear")()
        v, vb = _Weights((A, 1), use_bias=True, name="attn_linear")()
        if self.use_pallas:
            from visuelle2_tpu.ops.pallas.additive_attention import (
                fused_additive_attention,
            )

            return fused_additive_attention(
                encoder_out, decoder_hidden, we, wd, v, vb,
                weight_on=self.weight_on)
        h_j = encoder_out @ we
        s_i = decoder_hidden @ wd
        energy = (jnp.tanh(h_j + s_i[:, None, :]) @ v)[..., 0] + vb[0]
        alpha = jax.nn.softmax(energy, axis=1)
        base = encoder_out if self.weight_on == "inputs" else h_j
        return alpha[..., None] * base, alpha


def _dot_attention(q, k, v, *, scale, mask=None, dropout_rate=0.0,
                   deterministic=True, dropout_rng=None):
    """q: [B, h, Lq, d], k/v: [B, h, Lk, d] -> [B, h, Lq, d]."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if mask is not None:
        scores = scores + mask  # additive mask (0 / -inf), broadcastable
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v), probs


def _split_heads(x, num_heads):
    B, L, D = x.shape
    return x.reshape(B, L, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, h, L, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, h * d)


class MultiHeadAttention(nn.Module):
    """torch-``nn.MultiheadAttention``-compatible MHA, batch-first.

    Returns (output [B, Lq, D], attn_probs averaged over heads [B, Lq, Lk])
    — torch averages head probabilities when ``need_weights=True``.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, query, key, value, *, mask=None, deterministic=True):
        D, h = self.embed_dim, self.num_heads
        q = nn.Dense(D, name="q_proj")(query)
        k = nn.Dense(D, name="k_proj")(key)
        v = nn.Dense(D, name="v_proj")(value)
        qh, kh, vh = (_split_heads(t, h) for t in (q, k, v))
        rng = self.make_rng("dropout") if (self.dropout > 0 and not deterministic) else None
        out, probs = _dot_attention(
            qh, kh, vh, scale=(D // h) ** -0.5, mask=mask,
            dropout_rate=self.dropout, deterministic=deterministic, dropout_rng=rng)
        out = nn.Dense(D, name="out_proj")(_merge_heads(out))
        return out, probs.mean(axis=1)


class _GatedMHABase(nn.Module):
    """Shared implementation of the two v2 gated-MHA variants.

    Parameters live in ``_Weights`` children named exactly like ``nn.Dense``
    submodules ({kernel, bias}), so the XLA math path and the fused Pallas
    kernel (``ops/pallas/gated_mha.py``) see the identical tree.  The Pallas
    path engages when ``use_pallas`` and the call is deterministic (the
    kernel has no prob-dropout epilogue); train mode falls back to XLA.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    gate_bias_init: float = 2.0
    use_pallas: bool = False
    variant: str = "pure"  # "pure" | "head"

    @nn.compact
    def __call__(self, query, key, value, *, mask=None, deterministic=True):
        D, h = self.embed_dim, self.num_heads
        d = D // h
        wq, bq = _Weights((D, D), use_bias=True, name="q_proj")()
        wk, bk = _Weights((D, D), use_bias=True, name="k_proj")()
        wv, bv = _Weights((D, D), use_bias=True, name="v_proj")()
        gate_dim = d if self.variant == "head" else D
        wg, bg = _Weights((gate_dim, gate_dim), use_bias=True,
                          bias_init=self.gate_bias_init, name="gate_proj")()
        wo, bo = _Weights((D, D), use_bias=True, name="out_proj")()

        if self.use_pallas and (deterministic or self.dropout == 0.0):
            from visuelle2_tpu.ops.pallas.gated_mha import fused_gated_mha

            m = (jnp.zeros((query.shape[1], key.shape[1]), jnp.float32)
                 if mask is None else
                 jnp.broadcast_to(mask, (query.shape[1], key.shape[1]))
                 .astype(jnp.float32))
            return fused_gated_mha(
                query, key, value, m, wq, bq, wk, bk, wv, bv, wg, bg, wo, bo,
                num_heads=h, variant=self.variant)

        q = query @ wq + bq
        k = key @ wk + bk
        v = value @ wv + bv
        qh, kh, vh = (_split_heads(t, h) for t in (q, k, v))
        rng = (self.make_rng("dropout")
               if (self.dropout > 0 and not deterministic) else None)
        out, _ = _dot_attention(
            qh, kh, vh, scale=d ** -0.5, mask=mask,
            dropout_rate=self.dropout, deterministic=deterministic,
            dropout_rng=rng)
        if self.variant == "head":
            # Gate from the *projected per-head query* (v2 line 684).
            gate = jax.nn.sigmoid(qh @ wg + bg)
            merged = _merge_heads(out * gate)
        else:
            gate = jax.nn.sigmoid(query @ wg + bg)
            merged = _merge_heads(out) * gate
        return merged @ wo + bo


class PureGatedMultiHeadAttention(_GatedMHABase):
    """v2 cross-attention: concatenated head output gated by σ(W_g·query)
    *before* the out projection; gate bias init +2.0 (≈88% open)
    (``Proposed_model_v2.py:546-602``)."""

    variant: str = "pure"


class HeadSpecificGatedAttention(_GatedMHABase):
    """v2 encoder self-attention: per-head gate σ(W_g·q_head) on head_dim,
    gate bias init +2.0 (``Proposed_model_v2.py:643-690``)."""

    variant: str = "head"


class GatedCrossAttention(nn.Module):
    """v1 gated cross-attention: full standard MHA, output gated by
    σ(W_g·query), then dropout (``Proposed_model.py:194-224``).  The residual
    add+norm lives in the caller's decoder layer."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, key, value, *, mask=None, deterministic=True):
        attn_out, _ = MultiHeadAttention(
            self.embed_dim, self.num_heads, self.dropout, name="mha")(
            query, key, value, mask=mask, deterministic=deterministic)
        gate = jax.nn.sigmoid(nn.Dense(self.embed_dim, name="gate_proj")(query))
        return nn.Dropout(self.dropout, deterministic=deterministic)(attn_out * gate)
