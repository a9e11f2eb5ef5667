"""Post-norm transformer encoder/decoder layers (torch semantics) + the gated
variants used by the Proposed models.

Counterparts: ``nn.TransformerEncoderLayer``/``nn.TransformerDecoderLayer``
as instantiated at ``/root/reference/models/GTM_Visuelle2.py:52-53,200-202``
(ReLU FFN, post-norm), v1's ``GatedTransformerDecoderLayer``
(``Proposed_model.py:226-262``), and v2's gated encoder/decoder layers
(``Proposed_model_v2.py:692-741``).  Batch-first ``[B, L, D]`` throughout.
"""

from __future__ import annotations

from typing import Optional

from flax import linen as nn

from visuelle2_tpu.ops.attention import (
    GatedCrossAttention,
    HeadSpecificGatedAttention,
    MultiHeadAttention,
    PureGatedMultiHeadAttention,
)


class _FFN(nn.Module):
    d_model: int
    dim_feedforward: int
    dropout: float

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        h = nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(x))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.d_model, name="linear2")(h)


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: Optional[int] = None
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src, *, mask=None, deterministic=True):
        dff = self.dim_feedforward or 2048
        attn, _ = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                     name="self_attn")(
            src, src, src, mask=mask, deterministic=deterministic)
        src = nn.LayerNorm(name="norm1")(
            src + nn.Dropout(self.dropout, deterministic=deterministic)(attn))
        ff = _FFN(self.d_model, dff, self.dropout, name="ffn")(
            src, deterministic=deterministic)
        return nn.LayerNorm(name="norm2")(
            src + nn.Dropout(self.dropout, deterministic=deterministic)(ff))


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: Optional[int] = None
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, *, tgt_mask=None, memory_mask=None,
                 deterministic=True):
        dff = self.dim_feedforward or 2048
        sa, _ = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                   name="self_attn")(
            tgt, tgt, tgt, mask=tgt_mask, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm1")(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(sa))
        ca, _ = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                   name="cross_attn")(
            tgt, memory, memory, mask=memory_mask, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm2")(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(ca))
        ff = _FFN(self.d_model, dff, self.dropout, name="ffn")(
            tgt, deterministic=deterministic)
        return nn.LayerNorm(name="norm3")(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(ff))


class GatedTransformerEncoderLayer(nn.Module):
    """v2 trend encoder layer: head-specific gated self-attention
    (``Proposed_model_v2.py:692-711``)."""

    d_model: int
    nhead: int
    dim_feedforward: Optional[int] = None
    dropout: float = 0.1
    use_pallas: bool = False

    @nn.compact
    def __call__(self, src, *, mask=None, deterministic=True):
        dff = self.dim_feedforward or 2048
        attn = HeadSpecificGatedAttention(self.d_model, self.nhead, self.dropout,
                                          use_pallas=self.use_pallas,
                                          name="self_attn")(
            src, src, src, mask=mask, deterministic=deterministic)
        src = nn.LayerNorm(name="norm1")(
            src + nn.Dropout(self.dropout, deterministic=deterministic)(attn))
        ff = _FFN(self.d_model, dff, self.dropout, name="ffn")(
            src, deterministic=deterministic)
        return nn.LayerNorm(name="norm2")(
            src + nn.Dropout(self.dropout, deterministic=deterministic)(ff))


class GatedTransformerDecoderLayerV1(nn.Module):
    """v1 decoder layer: standard self-attn + v1 GatedCrossAttention (which
    carries its own dropout; the residual add is *not* dropped again —
    ``Proposed_model.py:249-262``)."""

    d_model: int
    nhead: int
    dim_feedforward: Optional[int] = None
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, *, tgt_mask=None, memory_mask=None,
                 deterministic=True):
        dff = self.dim_feedforward or 2048
        sa, _ = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                   name="self_attn")(
            tgt, tgt, tgt, mask=tgt_mask, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm1")(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(sa))
        ca = GatedCrossAttention(self.d_model, self.nhead, self.dropout,
                                 name="cross_attn")(
            tgt, memory, memory, mask=memory_mask, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm2")(tgt + ca)
        ff = _FFN(self.d_model, dff, self.dropout, name="ffn")(
            tgt, deterministic=deterministic)
        return nn.LayerNorm(name="norm3")(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(ff))


class GatedTransformerDecoderLayerV2(nn.Module):
    """v2 decoder layer: standard self-attn + PureGated cross-attn; the
    cross-attn residual is added without extra dropout
    (``Proposed_model_v2.py:713-741``)."""

    d_model: int
    nhead: int
    dim_feedforward: Optional[int] = None
    dropout: float = 0.1
    use_pallas: bool = False

    @nn.compact
    def __call__(self, tgt, memory, *, tgt_mask=None, memory_mask=None,
                 deterministic=True):
        dff = self.dim_feedforward or 2048
        sa, _ = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                   name="self_attn")(
            tgt, tgt, tgt, mask=tgt_mask, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm1")(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(sa))
        ca = PureGatedMultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                         use_pallas=self.use_pallas,
                                         name="cross_attn")(
            tgt, memory, memory, mask=memory_mask, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm2")(tgt + ca)
        ff = _FFN(self.d_model, dff, self.dropout, name="ffn")(
            tgt, deterministic=deterministic)
        return nn.LayerNorm(name="norm3")(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(ff))


class TransformerEncoder(nn.Module):
    """Stack of encoder layers (``nn.TransformerEncoder`` equivalent)."""

    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: Optional[int] = None
    dropout: float = 0.1
    gated: bool = False  # v2's gated trend encoder
    use_pallas: bool = False  # fused gated-MHA kernel (gated layers only)

    @nn.compact
    def __call__(self, src, *, mask=None, deterministic=True):
        for i in range(self.num_layers):
            if self.gated:
                src = GatedTransformerEncoderLayer(
                    self.d_model, self.nhead, self.dim_feedforward,
                    self.dropout, use_pallas=self.use_pallas,
                    name=f"layer{i}")(src, mask=mask,
                                      deterministic=deterministic)
            else:
                src = TransformerEncoderLayer(
                    self.d_model, self.nhead, self.dim_feedforward,
                    self.dropout, name=f"layer{i}")(
                    src, mask=mask, deterministic=deterministic)
        return src


class TransformerDecoder(nn.Module):
    """Stack of decoder layers; ``variant`` picks standard / v1-gated / v2-gated."""

    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: Optional[int] = None
    dropout: float = 0.1
    variant: str = "standard"  # "standard" | "gated_v1" | "gated_v2"
    use_pallas: bool = False  # fused gated-MHA kernel (gated_v2 only)

    @nn.compact
    def __call__(self, tgt, memory, *, tgt_mask=None, memory_mask=None,
                 deterministic=True):
        for i in range(self.num_layers):
            if self.variant == "gated_v2":
                tgt = GatedTransformerDecoderLayerV2(
                    self.d_model, self.nhead, self.dim_feedforward,
                    self.dropout, use_pallas=self.use_pallas,
                    name=f"layer{i}")(
                    tgt, memory, tgt_mask=tgt_mask, memory_mask=memory_mask,
                    deterministic=deterministic)
                continue
            layer_cls = {
                "standard": TransformerDecoderLayer,
                "gated_v1": GatedTransformerDecoderLayerV1,
            }[self.variant]
            tgt = layer_cls(self.d_model, self.nhead, self.dim_feedforward,
                            self.dropout, name=f"layer{i}")(
                tgt, memory, tgt_mask=tgt_mask, memory_mask=memory_mask,
                deterministic=deterministic)
        return tgt
