"""Multimodal fusion networks for the GTM / M4FT / Gated model families.

Each class mirrors one reference fusion design (SURVEY.md §2.2); the gated
variants also have a Pallas-fused execution path (``ops/pallas/gated_fusion``)
selectable via ``use_pallas`` on TPU.

* ``GTMFusionNetwork``          — concat(img, text_flat, dummy) -> BN -> MLP
  (``GTM_Visuelle2.py:151-172``)
* ``FusionBlock`` / ``M4FTFusionNetwork`` — hierarchical summation fusion
  (``M4FT_Visuelle2.py:161-202``)
* ``GatedResidualBlock`` / ``ResidualGatedFusionNetwork`` — v1 per-modality
  soft gates + LayerNorm residual (``Proposed_model.py:141-188``)
* ``PureGatedFusionNetwork``    — v2 post-concat soft gate, bias init +2.0
  (``Proposed_model_v2.py:604-637``)
* ``TARGFusionNetwork``         — v3 target-anchored residual gating
  (``Proposed_model_v3.py:175-236``)
* ``TextGuidedFusionNetwork``   — v4 text-anchored gates on image/temporal
  (``Proposed_model_v4.py:152-198``)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from visuelle2_tpu.models.norms import BatchNorm1d



class _GateParams(nn.Module):
    """Dense-compatible gate parameters ({name: {kernel, bias}}) shared by the
    XLA and Pallas execution paths."""

    shape: tuple
    bias_init: float = 0.0

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = self.param("bias", nn.initializers.constant(self.bias_init),
                       (self.shape[-1],))
        return k, b


def _gated_residual(x, ctx, kernel, bias, *, residual=True, use_pallas=False):
    """σ-gate with concat([ctx, x]) @ kernel + bias semantics.

    ``kernel`` is the Dense kernel over the concatenation [ctx, x] (rows
    0..C-1 belong to ctx); the Pallas path splits it and runs the fused
    VMEM-resident kernel (ops/pallas/gated_fusion.py), the XLA path is the
    plain formula.  residual=True -> x + x·g, else x·g.
    """
    C = ctx.shape[-1]
    if use_pallas:
        from visuelle2_tpu.ops.pallas.gated_fusion import fused_gated_residual

        return fused_gated_residual(x, ctx, kernel[C:], kernel[:C], bias,
                                    residual=residual)
    g = jax.nn.sigmoid(jnp.concatenate([ctx, x], axis=-1) @ kernel + bias)
    return x + x * g if residual else x * g


def _flatten_text(text_encoding):
    """[B, 4, E] -> [B, 4E] (GTM_Visuelle2.py:167)."""
    return text_encoding.reshape(text_encoding.shape[0], -1)


class GTMFusionNetwork(nn.Module):
    """Simple concat fusion: img(E) ⊕ text(4E) ⊕ dummy(E) -> BN -> Linear ->
    ReLU -> Dropout -> Linear(H)."""

    embedding_dim: int
    hidden_dim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, img, text, dummy, *, train=False, deterministic=True):
        # img/text may be None for modality ablations: the concat shrinks,
        # GTM.py:62 semantics (input_dim = E + E*use_img + 4E*use_text).  The
        # reference's Visuelle2 family *accepts* use_img/use_text ctor flags
        # but never reads them (GTM_Visuelle2.py:179 — dead parameters); we
        # implement the GTM.py:54-88 behavior instead of silently ignoring.
        parts = [p for p in (img, None if text is None else _flatten_text(text),
                             dummy) if p is not None]
        x = jnp.concatenate(parts, axis=-1)
        D = x.shape[-1]
        x = BatchNorm1d(D, name="bn")(x, use_running_average=not train)
        x = nn.relu(nn.Dense(D, use_bias=False, name="fc1")(x))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.hidden_dim, name="fc2")(x)


class FusionBlock(nn.Module):
    """BN -> Linear -> ReLU -> Dropout -> Linear (M4FT_Visuelle2.py:161-173)."""

    hidden_dim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, *, train=False, deterministic=True):
        x = BatchNorm1d(self.hidden_dim, name="bn")(x, use_running_average=not train)
        x = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(x))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.hidden_dim, name="fc2")(x)


class M4FTFusionNetwork(nn.Module):
    """Hierarchical summation fusion (M4FT_Visuelle2.py:175-202):
    out_tt = FB(temp+text); out_tv = FB(text+vis);
    final = FB(out_tt + out_tv + temp + text + vis)."""

    hidden_dim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, e_temp, e_text, e_vis, *, train=False, deterministic=True):
        # Ablated modalities (None) contribute zero to every summation; the
        # hierarchical block structure is preserved (see GTMFusionNetwork for
        # why we implement ablation at all).
        zero = jnp.zeros_like(e_temp)
        e_text = zero if e_text is None else e_text
        e_vis = zero if e_vis is None else e_vis
        out_tt = FusionBlock(self.hidden_dim, self.dropout, name="fusion_temp_text")(
            e_temp + e_text, train=train, deterministic=deterministic)
        out_tv = FusionBlock(self.hidden_dim, self.dropout, name="fusion_text_vis")(
            e_text + e_vis, train=train, deterministic=deterministic)
        return FusionBlock(self.hidden_dim, self.dropout, name="fusion_final")(
            out_tt + out_tv + e_temp + e_text + e_vis,
            train=train, deterministic=deterministic)


class GatedResidualBlock(nn.Module):
    """LayerNorm(x + x·σ(Wx+b)) (Proposed_model.py:141-154)."""

    @nn.compact
    def __call__(self, x):
        gate = jax.nn.sigmoid(nn.Dense(x.shape[-1], name="gate_fc")(x))
        return nn.LayerNorm(name="norm")(x + x * gate)


class ResidualGatedFusionNetwork(nn.Module):
    """v1: per-modality gated residual blocks, concat, project
    (Proposed_model.py:156-188)."""

    embedding_dim: int
    hidden_dim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, img, text, dummy, *, train=False, deterministic=True):
        parts = []
        if img is not None:
            parts.append(GatedResidualBlock(name="img_gate")(img))
        if text is not None:
            parts.append(GatedResidualBlock(name="text_gate")(_flatten_text(text)))
        parts.append(GatedResidualBlock(name="dummy_gate")(dummy))
        x = jnp.concatenate(parts, axis=-1)
        x = nn.relu(nn.Dense(self.hidden_dim, name="fusion_fc")(x))
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


class PureGatedFusionNetwork(nn.Module):
    """v2: concat all, soft gate x + x·σ(Wx + 2.0), project
    (Proposed_model_v2.py:604-637)."""

    embedding_dim: int
    hidden_dim: int
    dropout: float = 0.2
    gate_bias_init: float = 2.0

    @nn.compact
    def __call__(self, img, text, dummy, *, train=False, deterministic=True):
        parts = [p for p in (img, None if text is None else _flatten_text(text),
                             dummy) if p is not None]
        x = jnp.concatenate(parts, axis=-1)
        gate = jax.nn.sigmoid(nn.Dense(
            x.shape[-1], name="gate_fc",
            bias_init=nn.initializers.constant(self.gate_bias_init))(x))
        x = x + x * gate
        x = nn.relu(nn.Dense(self.hidden_dim, name="fusion_fc")(x))
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


class TARGFusionNetwork(nn.Module):
    """v3 TARG: anchor modality Q kept as identity, contexts gated by
    σ(W[Q;Cᵢ]) (bias 0) and added; M4FT FusionBlock on top
    (Proposed_model_v3.py:175-236)."""

    hidden_dim: int
    query_modality: str = "text"  # text | image | temporal
    dropout: float = 0.2

    @nn.compact
    def __call__(self, e_temp, e_text, e_vis, *, train=False, deterministic=True):
        anchors = {
            "text": (e_text, e_vis, e_temp),
            "image": (e_vis, e_text, e_temp),
            "temporal": (e_temp, e_text, e_vis),
        }
        q, c1, c2 = anchors[self.query_modality]
        if q is None:
            raise ValueError(
                f"TARG anchor modality '{self.query_modality}' is ablated "
                "(use_text/use_img) — pick another query_modality")
        fused = q
        # Ablated contexts (None) drop their gate entirely.
        for i, c in enumerate((c1, c2), start=1):
            if c is None:
                continue
            g = jax.nn.sigmoid(nn.Dense(self.hidden_dim, name=f"gate_fc{i}")(
                jnp.concatenate([q, c], axis=-1)))
            fused = fused + c * g
        return FusionBlock(self.hidden_dim, self.dropout, name="fusion_final")(
            fused, train=train, deterministic=deterministic)


class TextGuidedFusionNetwork(nn.Module):
    """v4 TG-Fusion: text-anchored soft gates on image and temporal, concat,
    Linear -> LayerNorm -> ReLU -> Dropout (Proposed_model_v4.py:152-198)."""

    embedding_dim: int
    hidden_dim: int
    dropout: float = 0.1
    use_pallas: bool = False

    @nn.compact
    def __call__(self, img, text, dummy, *, train=False, deterministic=True):
        if text is None:
            raise ValueError("TG-Fusion is text-anchored: use_text=False is "
                             "structurally impossible for gated_v4")
        text_flat = _flatten_text(text)
        C, Dd = text_flat.shape[-1], dummy.shape[-1]
        dummy_w = _GateParams((C + Dd, Dd), name="dummy_gate_fc")()
        gated_dummy = _gated_residual(dummy, text_flat, *dummy_w,
                                      use_pallas=self.use_pallas)
        parts = [text_flat, gated_dummy]
        if img is not None:
            img_w = _GateParams((C + img.shape[-1], img.shape[-1]),
                                name="img_gate_fc")()
            parts.insert(0, _gated_residual(img, text_flat, *img_w,
                                            use_pallas=self.use_pallas))
        x = jnp.concatenate(parts, axis=-1)
        x = nn.Dense(self.hidden_dim, name="fusion_fc")(x)
        x = nn.relu(nn.LayerNorm(name="fusion_norm")(x))
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)
