"""GTM / M4FT / Gated (v1–v4) transformer forecasters.

The reference implements these as six near-identical LightningModules
(``/root/reference/models/GTM_Visuelle2.py``, ``M4FT_Visuelle2.py``,
``Proposed_model{,_v2,_v3,_v4}.py``) sharing ~80% of their code.  Here they
are one configurable module — ``Seq2SeqForecaster`` — whose fields select the
encoder style, fusion network, trend encoder and decoder variant; the
``VARIANTS`` table pins each reference model's exact configuration.

Decode semantics (identical across the family, ``GTM_Visuelle2.py:249-260``):

* non-AR: a single fused token cross-attends over the 52-step trend memory,
  then a ``Linear(H -> out_len)`` head.
* AR: an ``out_len``-token target (position 0 = fused context, rest zeros)
  with sinusoidal positions and a causal mask, ``Linear(H -> 1)`` head.

The unused ``decoder_linear = TimeDistributed(Linear(1, H))`` in the
reference constructors (``GTM_Visuelle2.py:199``) is intentionally omitted —
it is dead code there.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from visuelle2_tpu.models.base import VocabSizes, flatten_windows, repeat_windows
from visuelle2_tpu.models.encoders import (
    AttributeEncoder,
    DummyEmbedder,
    GTrendEmbedder,
    ImagePooledEncoder,
    SalesEncoder,
    TemporalEmbedder,
)
from visuelle2_tpu.models.fusion import (
    GTMFusionNetwork,
    M4FTFusionNetwork,
    PureGatedFusionNetwork,
    ResidualGatedFusionNetwork,
    TARGFusionNetwork,
    TextGuidedFusionNetwork,
)
from visuelle2_tpu.ops.masks import causal_mask
from visuelle2_tpu.ops.positional import PositionalEncoding
from visuelle2_tpu.ops.transformer import TransformerDecoder


@dataclasses.dataclass(frozen=True)
class Seq2SeqVariant:
    """Which reference model this configuration reproduces."""

    encoder_style: str   # "gtm" (stack-text) | "m4ft" (projected-to-hidden)
    fusion: str          # gtm | m4ft | gated_v1 | gated_v2 | targ_v3 | tg_v4
    decoder: str         # standard | gated_v1 | gated_v2
    trend_encoder_gated: bool = False


VARIANTS = {
    # GTM_Visuelle2.py:178-262
    "gtm": Seq2SeqVariant("gtm", "gtm", "standard"),
    # M4FT_Visuelle2.py:208-300
    "m4ft": Seq2SeqVariant("m4ft", "m4ft", "standard"),
    # Proposed_model.py:268-340 (R-GFN fusion + gated cross-attn decoder)
    "gated_v1": Seq2SeqVariant("gtm", "gated_v1", "gated_v1"),
    # Proposed_model_v2.py:747-847 (pure gating everywhere)
    "gated_v2": Seq2SeqVariant("gtm", "gated_v2", "gated_v2", trend_encoder_gated=True),
    # Proposed_model_v3.py:242-330 (TARG over M4FT encoders)
    "gated_v3": Seq2SeqVariant("m4ft", "targ_v3", "standard"),
    # Proposed_model_v4.py:204-289 (TG-Fusion + standard enc/dec)
    "gated_v4": Seq2SeqVariant("gtm", "tg_v4", "standard"),
}


class Seq2SeqForecaster(nn.Module):
    """One model covering the whole GTM-family design space."""

    variant: str = "gtm"
    embedding_dim: int = 32
    hidden_dim: int = 64
    output_len: int = 12
    num_heads: int = 4
    num_layers: int = 1
    vocab: VocabSizes = VocabSizes(5, 6, 5)
    trend_len: int = 52
    num_trends: int = 3
    use_encoder_mask: bool = True
    autoregressive: bool = False
    # Modality ablations.  The reference's Visuelle2 family accepts these ctor
    # flags but never reads them (GTM_Visuelle2.py:179, train_GTM_visuelle2.py:
    # 100-101 — dead parameters); we give them the GTM.py:54-88 semantics:
    # the disabled modality's encoder is skipped entirely (no ResNet pass for
    # use_img=False) and the fusion input shrinks/drops its term.
    use_text: bool = True
    use_img: bool = True
    query_modality: str = "text"  # v3 only (Proposed_model_v3.py:245)
    image_arch: str = "resnet101"
    image_dtype: Any = jnp.float32
    # Rematerialize backbone blocks on backward (jax.checkpoint): trades
    # FLOPs for HBM so large train batches fit.
    image_remat: bool = False
    use_pallas: bool = False  # route gated fusion through the fused TPU kernel

    @nn.compact
    def __call__(self, batch, *, train=False):
        det = not train
        cfg = VARIANTS[self.variant]
        E, H = self.embedding_dim, self.hidden_dim

        item_sales = batch.get("X")
        if item_sales is None:
            # Demand batches carry no history: zeros(bs, 1, 2)
            # (GTM_Visuelle2.py:273-276).
            bs = batch["ts"].shape[0]
            item_sales = jnp.zeros((bs, 1, 2), batch["ts"].dtype)
        sales, B, W = flatten_windows(item_sales)
        N = B * W

        # ----- Trend memory -------------------------------------------------
        memory = GTrendEmbedder(
            self.output_len, H, num_trends=self.num_trends,
            trend_len=self.trend_len, use_mask=self.use_encoder_mask,
            num_layers=2, nhead=self.num_heads if cfg.trend_encoder_gated else 4,
            dropout=0.2, gated=cfg.trend_encoder_gated,
            use_pallas=self.use_pallas,
            name="gtrend_encoder")(batch["gtrends"], deterministic=det)
        memory = repeat_windows(memory, W)

        # ----- Static modality encoders -------------------------------------
        # Ablated modalities (use_text/use_img False) skip their encoder
        # entirely — for images that skips the whole CNN backbone.
        h_text = h_img = None
        if cfg.encoder_style == "gtm":
            if self.use_text:
                h_text = AttributeEncoder(
                    self.vocab.num_cat, self.vocab.num_col, self.vocab.num_fab,
                    self.vocab.num_store, E, combine="stack",
                    name="text_encoder")(
                    batch["cat"], batch["col"], batch["fab"], batch["store"],
                    deterministic=det)
            if self.use_img:
                h_img = ImagePooledEncoder(
                    E, arch=self.image_arch, dtype=self.image_dtype,
                    remat=self.image_remat, name="image_encoder")(
                    batch["images"], train=train, deterministic=det,
                    img_idx=batch.get("img_idx"))
            h_dummy = DummyEmbedder(E, name="dummy_encoder")(
                batch["temporal"], deterministic=det)
        else:  # m4ft: everything projected to hidden_dim
            if self.use_text:
                h_text = AttributeEncoder(
                    self.vocab.num_cat, self.vocab.num_col, self.vocab.num_fab,
                    self.vocab.num_store, E, combine="concat_proj", hidden_dim=H,
                    name="text_encoder")(
                    batch["cat"], batch["col"], batch["fab"], batch["store"],
                    deterministic=det)
            if self.use_img:
                h_img = ImagePooledEncoder(
                    E, final_dim=H, arch=self.image_arch, dtype=self.image_dtype,
                    remat=self.image_remat, name="image_encoder")(
                    batch["images"], train=train, deterministic=det,
                    img_idx=batch.get("img_idx"))
            h_dummy = TemporalEmbedder(E, H, name="temporal_encoder")(
                batch["temporal"], deterministic=det)

        if h_text is not None:
            h_text = repeat_windows(h_text, W)
        if h_img is not None:
            h_img = repeat_windows(h_img, W)
        h_dummy = repeat_windows(h_dummy, W)

        # ----- Fusion --------------------------------------------------------
        fusions = {
            "gtm": lambda: GTMFusionNetwork(E, H, name="fusion")(
                h_img, h_text, h_dummy, train=train, deterministic=det),
            "m4ft": lambda: M4FTFusionNetwork(H, name="fusion")(
                h_dummy, h_text, h_img, train=train, deterministic=det),
            "gated_v1": lambda: ResidualGatedFusionNetwork(E, H, name="fusion")(
                h_img, h_text, h_dummy, train=train, deterministic=det),
            "gated_v2": lambda: PureGatedFusionNetwork(E, H, name="fusion")(
                h_img, h_text, h_dummy, train=train, deterministic=det),
            "targ_v3": lambda: TARGFusionNetwork(
                H, query_modality=self.query_modality, name="fusion")(
                h_dummy, h_text, h_img, train=train, deterministic=det),
            "tg_v4": lambda: TextGuidedFusionNetwork(
                E, H, dropout=0.1, use_pallas=self.use_pallas, name="fusion")(
                h_img, h_text, h_dummy, train=train, deterministic=det),
        }
        static_context = fusions[cfg.fusion]()

        # ----- Sales history --------------------------------------------------
        h_sales = SalesEncoder(H, name="sales_encoder")(sales, deterministic=det)
        decoder_input = h_sales[:, -1, :] + static_context  # GTM_Visuelle2.py:243-247

        # ----- Decode ---------------------------------------------------------
        decoder = TransformerDecoder(
            H, self.num_heads, self.num_layers, dim_feedforward=H * 4,
            dropout=0.1, variant=cfg.decoder, use_pallas=self.use_pallas,
            name="decoder")
        if self.autoregressive:
            tgt = jnp.zeros((N, self.output_len, H), decoder_input.dtype)
            tgt = tgt.at[:, 0, :].set(decoder_input)
            tgt = PositionalEncoding(H, dropout=0.1, max_len=max(self.output_len, 12),
                                     name="pos_encoder")(tgt, deterministic=det)
            out = decoder(tgt, memory, tgt_mask=causal_mask(self.output_len),
                          deterministic=det)
            forecast = nn.Dense(1, name="decoder_fc")(out)[..., 0]  # [N, out_len]
        else:
            tgt = decoder_input[:, None, :]
            out = decoder(tgt, memory, deterministic=det)
            forecast = nn.Dense(self.output_len, name="decoder_fc")(out[:, 0, :])
        forecast = nn.Dropout(0.2, deterministic=det)(forecast)
        return forecast.reshape(N, self.output_len), None
