"""Legacy shared blocks from the reference's ``models/modules.py`` (kept for
API completeness; no current reference script imports them — SURVEY.md §2.2).

* ``LegacyImageEncoder`` — InceptionV3 -> 64 patch tokens -> Linear(E)
  (``modules.py:65-94``; avgpool/dropout/fc replaced by identity, 8x8x2048
  reshaped to [B, 64, 2048]).
* ``LegacyAdditiveAttention`` — the alpha·h_j weighting variant
  (``modules.py:97-122``) = ``ops.attention.AdditiveAttention(weight_on="projected")``.
* ``LegacyTemporalFeatureEncoder`` — the all-four-features-through-
  day_embedding variant (``modules.py:40-62``) =
  ``encoders.TemporalFeatureEncoder(shared_day_embedding=True)``.
* ``TSEmbedder`` / ``AttributeEncoder`` — identical to the per-model copies,
  re-exported from ``encoders``.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from visuelle2_tpu.data.images import normalize_images
from visuelle2_tpu.models.encoders import (  # noqa: F401 (re-exports)
    AttributeEncoder,
    TemporalFeatureEncoder,
    TSEmbedder,
)
from visuelle2_tpu.models.inception import InceptionV3Backbone
from visuelle2_tpu.ops.attention import AdditiveAttention

LegacyAdditiveAttention = functools.partial(AdditiveAttention, weight_on="projected")
LegacyTemporalFeatureEncoder = functools.partial(
    TemporalFeatureEncoder, shared_day_embedding=True)


class LegacyImageEncoder(nn.Module):
    """InceptionV3 patch encoder (``modules.py:65-94``): uint8 NHWC 299x299
    -> [B, 64, E].  ``fine_tune=False`` freezes the whole backbone (the
    reference's default)."""

    embedding_dim: int
    fine_tune: bool = False
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images_u8, *, train=False, deterministic=True):
        x = normalize_images(images_u8, dtype=self.dtype)
        # Named "backbone" like every image encoder so --pretrained_backbone
        # (models/pretrained.py splice) reaches the Inception weights too.
        feats = InceptionV3Backbone(dtype=self.dtype, name="backbone")(
            x, train=train and self.fine_tune)
        if not self.fine_tune:
            feats = jax.lax.stop_gradient(feats)
        B, H, W, C = feats.shape
        patches = feats.reshape(B, H * W, C).astype(jnp.float32)
        out = nn.Dense(self.embedding_dim, name="fc")(patches)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)
