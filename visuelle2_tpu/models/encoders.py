"""Shared modality encoders for all model families.

Reference counterparts are per-file duplicated submodules (SURVEY.md §1); here
they are a single parameterized library:

* ``TSEmbedder``            — GRU trend encoder (``CrossAttnRNN210.py:12-24``)
* ``SalesEncoder``          — GRU sales-history encoder (``GTM_Visuelle2.py:99-107``)
* ``AttributeEncoder``      — 4 embeddings, combine ∈ {sum, stack, concat_proj}
  (sum: ``CrossAttnRNN210.py:26-40``; stack: ``GTM_Visuelle2.py:81-96``;
  concat_proj: ``M4FT_Visuelle2.py:83-102``)
* ``TemporalFeatureEncoder``— 4 per-feature linears summed
  (``CrossAttnRNN210.py:42-56``); ``shared_day_embedding`` reproduces the
  Demand variant that (buggily) reuses the day projection for all four
  features (``CrossAttnRNNDemand.py:55-65``)
* ``DummyEmbedder``         — concat-4-then-fuse (``GTM_Visuelle2.py:129-145``)
* ``TemporalEmbedder``      — M4FT concat-proj variant (``M4FT_Visuelle2.py:126-145``)
* ``ImagePatchEncoder``     — ResNet patches -> linear (``CrossAttnRNN21.py:58-72``)
* ``ImagePooledEncoder``    — ResNet -> 1x1 conv -> global pool [-> proj]
  (``GTM_Visuelle2.py:110-126``, M4FT ``:104-124``)
* ``GTrendEmbedder``        — linear -> positional -> transformer encoder with
  gcd block mask (``GTM_Visuelle2.py:46-74``); ``gated=True`` gives v2's
  gated-encoder version (``Proposed_model_v2.py:764-768``)

All encoders take pre-normalized device tensors; image encoders take uint8
NHWC and fuse normalization on device (images.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from visuelle2_tpu.data.images import normalize_images
from visuelle2_tpu.models.resnet import ResNetBackbone, STAGE_BLOCKS
from visuelle2_tpu.ops.gru import GRU
from visuelle2_tpu.ops.masks import gcd_block_mask
from visuelle2_tpu.ops.positional import PositionalEncoding
from visuelle2_tpu.ops.transformer import TransformerEncoder


class TSEmbedder(nn.Module):
    """GRU over the trend series: [B, T, C] -> dropout(outputs [B, T, E])."""

    embedding_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        out, _ = GRU(self.embedding_dim, name="gru")(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class SalesEncoder(nn.Module):
    """GRU over sales history: [B, T, 1] -> dropout(outputs [B, T, H])."""

    embedding_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        out, _ = GRU(self.embedding_dim, name="gru")(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class AttributeEncoder(nn.Module):
    """Category/color/fabric/store embeddings.

    combine="sum"         -> [B, E]     (CrossAttnRNN family)
    combine="stack"       -> [B, 4, E]  (GTM family)
    combine="concat_proj" -> [B, H]     (M4FT family; proj to hidden_dim)
    """

    num_cat: int
    num_col: int
    num_fab: int
    num_store: int
    embedding_dim: int
    combine: str = "sum"
    hidden_dim: Optional[int] = None
    dropout: float = 0.1

    @nn.compact
    def __call__(self, cat, col, fab, store, *, deterministic=True):
        E = self.embedding_dim
        embs = [
            nn.Embed(self.num_cat, E, name="cat")(cat),
            nn.Embed(self.num_col, E, name="col")(col),
            nn.Embed(self.num_fab, E, name="fab")(fab),
            nn.Embed(self.num_store, E, name="store")(store),
        ]
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        if self.combine == "sum":
            # Reference drops each embedding independently then sums
            # (CrossAttnRNN210.py:35-40).
            return sum(drop(e) for e in embs)
        if self.combine == "stack":
            return drop(jnp.stack(embs, axis=1))
        if self.combine == "concat_proj":
            concat = jnp.concatenate(embs, axis=-1)
            return drop(nn.Dense(self.hidden_dim or E, name="proj")(concat))
        raise ValueError(self.combine)


class TemporalFeatureEncoder(nn.Module):
    """Four scalar features -> E each, summed (``CrossAttnRNN210.py:42-56``).

    ``shared_day_embedding=True`` reuses the day projection for all four
    features — faithful to ``CrossAttnRNNDemand.py:55-65`` (a reference quirk
    kept reproducible for checkpoint parity; off by default).
    """

    embedding_dim: int
    dropout: float = 0.1
    shared_day_embedding: bool = False

    @nn.compact
    def __call__(self, temporal, *, deterministic=True):
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        names = ["day", "week", "month", "year"]
        out = 0.0
        if self.shared_day_embedding:
            # One module instance applied to all four features — constructing
            # four same-named Dense modules is a flax NameInUseError.
            day = nn.Dense(self.embedding_dim, name="day")
            layers = [day] * 4
        else:
            layers = [nn.Dense(self.embedding_dim, name=nm) for nm in names]
        for i, layer in enumerate(layers):
            out = out + drop(layer(temporal[:, i: i + 1]))
        return out


class DummyEmbedder(nn.Module):
    """GTM temporal encoder: 4 linears -> concat -> fuse (``GTM_Visuelle2.py:129-145``)."""

    embedding_dim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, temporal, *, deterministic=True):
        E = self.embedding_dim
        parts = [nn.Dense(E, name=nm)(temporal[:, i: i + 1])
                 for i, nm in enumerate(["day", "week", "month", "year"])]
        fused = nn.Dense(E, name="fusion")(jnp.concatenate(parts, axis=-1))
        return nn.Dropout(self.dropout, deterministic=deterministic)(fused)


class TemporalEmbedder(nn.Module):
    """M4FT temporal encoder projecting to hidden_dim (``M4FT_Visuelle2.py:126-145``)."""

    embedding_dim: int
    hidden_dim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, temporal, *, deterministic=True):
        E = self.embedding_dim
        parts = [nn.Dense(E, name=nm)(temporal[:, i: i + 1])
                 for i, nm in enumerate(["day", "week", "month", "year"])]
        fused = nn.Dense(self.hidden_dim, name="proj")(jnp.concatenate(parts, axis=-1))
        return nn.Dropout(self.dropout, deterministic=deterministic)(fused)


class ImagePatchEncoder(nn.Module):
    """ResNet backbone -> patch tokens -> linear (``CrossAttnRNN21.py:58-72``).

    uint8 NHWC images -> [B, P, E] where P = (H/32)·(W/32).
    Normalization is fused on device; the backbone runs in ``dtype``
    (bfloat16 recommended on TPU), the projection returns float32.
    """

    embedding_dim: int
    arch: str = "resnet101"
    dropout: float = 0.1
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, images_u8, *, train=False, deterministic=True,
                 img_idx=None):
        x = normalize_images(images_u8, dtype=self.dtype)
        feats = ResNetBackbone(STAGE_BLOCKS[self.arch], dtype=self.dtype,
                               remat=self.remat, name="backbone")(x, train=train)
        B, H, W, C = feats.shape
        patches = feats.reshape(B, H * W, C).astype(jnp.float32)
        out = nn.Dense(self.embedding_dim, name="fc")(patches)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        if img_idx is not None:
            # Unique-image batch (loader dedup_images): encode each image
            # once, expand features to rows by gather.
            out = jnp.take(out, img_idx, axis=0)
        return out


class ImagePooledEncoder(nn.Module):
    """ResNet -> 1x1 conv projection -> global average pool [-> final proj]
    (``GTM_Visuelle2.py:110-126``; ``final_dim`` set = M4FT ``:104-124``)."""

    embedding_dim: int
    final_dim: Optional[int] = None
    arch: str = "resnet101"
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, images_u8, *, train=False, deterministic=True,
                 img_idx=None):
        x = normalize_images(images_u8, dtype=self.dtype)
        feats = ResNetBackbone(STAGE_BLOCKS[self.arch], dtype=self.dtype,
                               remat=self.remat, name="backbone")(x, train=train)
        proj = nn.Conv(self.embedding_dim, (1, 1), use_bias=True,
                       dtype=self.dtype, name="projection")(feats)
        pooled = proj.mean(axis=(1, 2)).astype(jnp.float32)
        if self.final_dim is not None:
            pooled = nn.Dense(self.final_dim, name="final_proj")(pooled)
        if img_idx is not None:
            pooled = jnp.take(pooled, img_idx, axis=0)
        return pooled


class GTrendEmbedder(nn.Module):
    """Trend transformer encoder with the gcd block mask
    (``GTM_Visuelle2.py:46-74``); ``gated=True`` = v2's gated encoder."""

    forecast_horizon: int
    embedding_dim: int
    num_trends: int = 3
    trend_len: int = 52
    use_mask: bool = True
    num_layers: int = 2
    nhead: int = 4
    dropout: float = 0.2
    gated: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, gtrends, *, deterministic=True):
        # gtrends: [B, num_trends, trend_len] -> tokens [B, trend_len, E]
        x = jnp.swapaxes(gtrends, 1, 2)
        x = nn.Dense(self.embedding_dim, name="input_linear")(x)
        x = PositionalEncoding(self.embedding_dim, dropout=0.1,
                               max_len=self.trend_len, name="pos")(
            x, deterministic=deterministic)
        mask = gcd_block_mask(x.shape[1], self.forecast_horizon) if self.use_mask else None
        return TransformerEncoder(
            self.embedding_dim, self.nhead, self.num_layers,
            dim_feedforward=2048, dropout=self.dropout, gated=self.gated,
            use_pallas=self.use_pallas,
            name="encoder")(x, mask=mask, deterministic=deterministic)
