"""CrossAttnRNN model family: SO-fore 2-1, SO-fore 2-10, and Demand.

Reference counterparts: ``/root/reference/models/CrossAttnRNN21.py`` (single
MLP step), ``CrossAttnRNN210.py`` (10-step GRU decode with scheduled
sampling), ``CrossAttnRNNDemand.py`` (12-step decode from zero state with
modality toggles).

TPU-first design decisions:

* The per-timestep Python decode loop (``CrossAttnRNN210.py:191-226``) becomes
  a ``jax.lax.scan`` (via ``flax.linen.scan``) over a decode cell whose
  attention + GRU step is one fused XLA computation; static encodings are
  scan-broadcast, not recomputed.
* Scheduled sampling's per-step shared coin flip (``torch.rand(1) < ratio``,
  ``CrossAttnRNN210.py:217``) is pre-drawn outside the scan from a PRNG key
  and fed as a scanned boolean — one draw per step shared across the batch,
  exactly the reference semantics, with no retracing.
* Window flatten + encode-once/repeat (``CrossAttnRNN210.py:144-173``) are
  static reshapes/repeats per task config.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from visuelle2_tpu.models.base import flatten_windows, repeat_windows, VocabSizes
from visuelle2_tpu.models.encoders import (
    AttributeEncoder,
    ImagePatchEncoder,
    TemporalFeatureEncoder,
    TSEmbedder,
)
from visuelle2_tpu.ops.attention import AdditiveAttention, MultiHeadAttention
from visuelle2_tpu.ops.gru import GRU, GRUCellModule


class _StaticEncodings(nn.Module):
    """Shared modality encoding block for the family
    (CrossAttnRNN210.py:117-131, :163-179)."""

    embedding_dim: int
    vocab: VocabSizes
    num_trends: int = 3
    use_img: bool = True
    image_arch: str = "resnet101"
    image_dtype: Any = jnp.float32
    # Rematerialize backbone blocks on backward (jax.checkpoint): trades
    # FLOPs for HBM so large train batches fit.
    image_remat: bool = False
    # CrossAttnRNNDemand.py:55-65 reuses the day projection for all four
    # temporal features; we default to the fixed behaviour (SURVEY.md §7.3)
    # and keep the quirk reproducible for checkpoint parity.
    faithful_temporal_bug: bool = False

    @nn.compact
    def __call__(self, batch, *, train=False):
        det = not train
        E = self.embedding_dim
        img_encoding = None
        if self.use_img:
            img_encoding = ImagePatchEncoder(
                E, arch=self.image_arch, dtype=self.image_dtype,
                remat=self.image_remat,
                name="image_encoder")(
                batch["images"], train=train, deterministic=det,
                img_idx=batch.get("img_idx"))
        # gtrends [B, 3, 52] -> GRU over time with 3 trend channels.
        gtrend_encoding = TSEmbedder(E, name="trend_encoder")(
            jnp.swapaxes(batch["gtrends"], 1, 2), deterministic=det)
        dummy_encoding = TemporalFeatureEncoder(
            E, shared_day_embedding=self.faithful_temporal_bug,
            name="temp_encoder")(batch["temporal"], deterministic=det)
        attribute_encoding = AttributeEncoder(
            self.vocab.num_cat, self.vocab.num_col, self.vocab.num_fab,
            self.vocab.num_store, E, combine="sum", name="attribute_encoder")(
            batch["cat"], batch["col"], batch["fab"], batch["store"],
            deterministic=det)
        return img_encoding, gtrend_encoding, dummy_encoding, attribute_encoding


class _FusionAttention(nn.Module):
    """The per-step attention + fusion block shared by all three variants
    (CrossAttnRNN210.py:192-208).  ``weight_on`` selects the additive
    attention flavour (21/210: raw inputs; Demand: projected h_j)."""

    embedding_dim: int
    attention_dim: int
    trend_len: int = 52
    weight_on: str = "inputs"
    use_img: bool = True
    use_att: bool = True
    use_trends: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, img_enc, trend_enc, dummy_enc, attr_enc, hidden):
        alphas = {}
        tokens = [dummy_enc]
        if self.use_img:
            attended_img, alphas["img"] = AdditiveAttention(
                self.attention_dim, weight_on=self.weight_on,
                use_pallas=self.use_pallas,
                name="img_attention")(img_enc, hidden)
            tokens.append(attended_img.sum(axis=1))
        if self.use_att:
            tokens.append(attr_enc)
        if self.use_trends:
            attended_trend, alphas["trend"] = AdditiveAttention(
                self.attention_dim, weight_on=self.weight_on,
                use_pallas=self.use_pallas,
                name="ts_attention")(trend_enc, hidden)
            attended_trend = nn.Dense(self.embedding_dim, name="trend_linear")(
                attended_trend.reshape(attended_trend.shape[0], -1))
            tokens.append(attended_trend)
        mm_in = jnp.stack(tokens, axis=1)  # [N, n_tokens, E]
        attended_mm, alphas["multimodal"] = AdditiveAttention(
            self.attention_dim, weight_on=self.weight_on,
            use_pallas=self.use_pallas,
            name="multimodal_attention")(mm_in, hidden)
        final = mm_in + attended_mm  # residual (CrossAttnRNN210.py:207)
        context = nn.Dense(self.embedding_dim, name="multimodal_embedder")(
            final.sum(axis=1))
        return context, alphas


class CrossAttnRNN21(nn.Module):
    """SO-fore 2-1: all-modality encode + single-step MLP head
    (CrossAttnRNN21.py:95-211)."""

    attention_dim: int = 512
    embedding_dim: int = 512
    hidden_dim: int = 512
    vocab: VocabSizes = VocabSizes(5, 6, 5)
    num_trends: int = 3
    use_img: bool = True
    out_len: int = 1
    image_arch: str = "resnet101"
    image_dtype: Any = jnp.float32
    image_remat: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, batch, *, train=False):
        det = not train
        X, B, W = flatten_windows(batch["X"])
        img_enc, trend_enc, dummy_enc, attr_enc = _StaticEncodings(
            self.embedding_dim, self.vocab, self.num_trends, self.use_img,
            image_arch=self.image_arch, image_dtype=self.image_dtype,
            image_remat=self.image_remat,
            name="static")(batch, train=train)
        img_enc = repeat_windows(img_enc, W) if self.use_img else None
        trend_enc = repeat_windows(trend_enc, W)
        dummy_enc = repeat_windows(dummy_enc, W)
        attr_enc = repeat_windows(attr_enc, W)

        # Trend self-attention (CrossAttnRNN21.py:168-172).
        trend_enc, _ = MultiHeadAttention(
            self.embedding_dim, 4, dropout=0.1, name="ts_self_attention")(
            trend_enc, trend_enc, trend_enc, deterministic=det)

        # Sales-history GRU -> decoder context (CrossAttnRNN21.py:176-179).
        _, hidden = GRU(self.hidden_dim, name="sales_encoder_gru")(X)

        context, _alphas = _FusionAttention(
            self.embedding_dim, self.attention_dim, use_img=self.use_img,
            use_pallas=self.use_pallas,
            name="fusion")(img_enc, trend_enc, dummy_enc, attr_enc, hidden)
        pred = nn.Dense(1, name="decoder_fc")(context)
        return pred.reshape(B, W, 1), None  # (forecast, None) per reference :211


class _DecodeCell(nn.Module):
    """One AR decode step: attentions conditioned on hidden, fused context,
    GRU step, linear head, scheduled-sampling input select
    (CrossAttnRNN210.py:191-226 / CrossAttnRNNDemand.py:285-347)."""

    embedding_dim: int
    attention_dim: int
    hidden_dim: int
    weight_on: str = "inputs"
    use_img: bool = True
    use_att: bool = True
    use_trends: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, carry, statics, step_in):
        hidden, dec_in = carry
        img_enc, trend_enc, dummy_enc, attr_enc = statics
        y_t, coin_t = step_in
        context, alphas = _FusionAttention(
            self.embedding_dim, self.attention_dim, weight_on=self.weight_on,
            use_img=self.use_img, use_att=self.use_att,
            use_trends=self.use_trends, use_pallas=self.use_pallas,
            name="fusion")(
            img_enc, trend_enc, dummy_enc, attr_enc, hidden)
        gru_in = jnp.concatenate([context, dec_in], axis=-1)  # [N, E+1]
        hidden = GRUCellModule(self.hidden_dim, name="decoder_cell")(gru_in, hidden)
        pred = nn.Dense(1, name="decoder_fc")(hidden)  # [N, 1]
        next_in = jnp.where(coin_t, y_t[:, None], pred)
        return (hidden, next_in), (pred[:, 0], alphas)


class CrossAttnRNN210(nn.Module):
    """SO-fore 2-10: GRU decoder over ``out_len`` steps under lax.scan with
    scheduled sampling (CrossAttnRNN210.py:95-227)."""

    attention_dim: int = 512
    embedding_dim: int = 512
    hidden_dim: int = 512
    vocab: VocabSizes = VocabSizes(5, 6, 5)
    num_trends: int = 3
    use_img: bool = True
    out_len: int = 10
    use_teacher_forcing: bool = True
    teacher_forcing_ratio: float = 0.5
    image_arch: str = "resnet101"
    image_dtype: Any = jnp.float32
    image_remat: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, batch, *, train=False):
        det = not train
        X, B, W = flatten_windows(batch["X"])
        N = B * W
        img_enc, trend_enc, dummy_enc, attr_enc = _StaticEncodings(
            self.embedding_dim, self.vocab, self.num_trends, self.use_img,
            image_arch=self.image_arch, image_dtype=self.image_dtype,
            image_remat=self.image_remat,
            name="static")(batch, train=train)
        img_enc = repeat_windows(img_enc, W) if self.use_img else None
        trend_enc = repeat_windows(trend_enc, W)
        dummy_enc = repeat_windows(dummy_enc, W)
        attr_enc = repeat_windows(attr_enc, W)
        trend_enc, _ = MultiHeadAttention(
            self.embedding_dim, 4, dropout=0.1, name="ts_self_attention")(
            trend_enc, trend_enc, trend_enc, deterministic=det)

        _, hidden = GRU(self.hidden_dim, name="sales_encoder_gru")(X)
        dec_in = X[:, -1, :]  # last observed sale [N, 1]

        # Teacher forcing: per-step shared coin, train only (epoch hooks
        # CrossAttnRNN210.py:232-236 -> the `train` flag here).
        tf_on = self.use_teacher_forcing and train and ("y" in batch)
        if tf_on:
            coins = jax.random.bernoulli(
                self.make_rng("sampling"), self.teacher_forcing_ratio,
                (self.out_len,))
            ys = batch["y"].reshape(N, self.out_len).T  # [T, N]
        else:
            coins = jnp.zeros((self.out_len,), bool)
            ys = jnp.zeros((self.out_len, N), X.dtype)

        cell = nn.scan(
            _DecodeCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, 0),
            out_axes=0,
        )(self.embedding_dim, self.attention_dim, self.hidden_dim,
          use_img=self.use_img, use_pallas=self.use_pallas, name="decoder")
        _, (preds, _alphas) = cell((hidden, dec_in),
                                   (img_enc, trend_enc, dummy_enc, attr_enc),
                                   (ys, coins))
        return preds.T.reshape(B * W, self.out_len), None


class CrossAttnRNNDemand(nn.Module):
    """Demand (new product): 12-step decode from zero hidden/input with
    modality toggles (CrossAttnRNNDemand.py:183-349).  The input series is
    also the target (loss = MSE(ts, forecast), :380)."""

    attention_dim: int = 512
    embedding_dim: int = 512
    hidden_dim: int = 512
    vocab: VocabSizes = VocabSizes(5, 6, 5)
    num_trends: int = 3
    use_img: bool = True
    use_att: bool = True
    use_date: bool = True
    use_trends: bool = True
    out_len: int = 12
    use_teacher_forcing: bool = False
    teacher_forcing_ratio: float = 0.5
    image_arch: str = "resnet101"
    image_dtype: Any = jnp.float32
    image_remat: bool = False
    use_pallas: bool = False
    faithful_temporal_bug: bool = False

    @nn.compact
    def __call__(self, batch, *, train=False):
        det = not train
        ts = batch["ts"]
        N = ts.shape[0]
        img_enc, trend_enc, dummy_enc, attr_enc = _StaticEncodings(
            self.embedding_dim, self.vocab, self.num_trends, self.use_img,
            image_arch=self.image_arch, image_dtype=self.image_dtype,
            image_remat=self.image_remat,
            faithful_temporal_bug=self.faithful_temporal_bug,
            name="static")(batch, train=train)
        if self.use_trends:
            trend_enc, _ = MultiHeadAttention(
                self.embedding_dim, 4, dropout=0.1, name="ts_self_attention")(
                trend_enc, trend_enc, trend_enc, deterministic=det)

        hidden = jnp.zeros((N, self.hidden_dim), ts.dtype)
        dec_in = jnp.zeros((N, 1), ts.dtype)

        tf_on = self.use_teacher_forcing and train
        if tf_on:
            coins = jax.random.bernoulli(
                self.make_rng("sampling"), self.teacher_forcing_ratio,
                (self.out_len,))
        else:
            coins = jnp.zeros((self.out_len,), bool)
        ys = ts.T  # [12, N] — teacher input IS the series (Demand:346-347)

        cell = nn.scan(
            _DecodeCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, 0),
            out_axes=0,
        )(self.embedding_dim, self.attention_dim, self.hidden_dim,
          weight_on="projected", use_img=self.use_img, use_att=self.use_att,
          use_trends=self.use_trends, use_pallas=self.use_pallas,
          name="decoder")
        _, (preds, alphas) = cell((hidden, dec_in),
                                  (img_enc, trend_enc, dummy_enc, attr_enc),
                                  (ys, coins))
        # aux carries the per-step attention weights the reference collects
        # (CrossAttnRNNDemand.py:280,293,321): each entry is [T, N, L].
        return preds.T[..., None], alphas
