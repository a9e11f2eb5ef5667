"""GTM — the original VISUELLE-1 Google-Trends transformer
(``/root/reference/models/GTM.py``; not referenced by any reference script but
part of the model inventory, SURVEY.md §2.2).

Faithful pieces:

* **Text branch** (``GTM.py:124-153``): the reference runs a frozen BERT
  feature-extraction pipeline on "color fabric category" strings *inside
  forward on CPU*.  TPU-native split: the expensive frozen-BERT pass happens
  once at ingest (``TextFeaturizer`` below — host-side, cached), and the
  in-graph part is just the trainable ``Linear(768 -> E)`` + dropout.  When
  pretrained BERT weights are unavailable (zero-egress container), a
  deterministic random-projection featurizer stands in, with a warning.
* **Image branch** (``GTM.py:155-175``): fully-frozen ResNet-50 feature map
  (no finetuned stages, unlike the Visuelle2 encoders).
* **Fusion** (``GTM.py:54-88``): pool + Linear(2048, E), concat with
  text/dummy by ``use_img``/``use_text``, BN -> Linear -> ReLU -> Dropout ->
  Linear(H).
* **Decoder** (``GTM.py:199-232``): memory-only cross-attention layer (no
  self-attention) that also returns the attention weights; AR/non-AR decode
  (``GTM.py:280-294``).
* Norm scalar for metrics is **1065** (VISUELLE-1 train max, ``GTM.py:321``),
  not 53.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from visuelle2_tpu.data.images import normalize_images
from visuelle2_tpu.models.encoders import DummyEmbedder, GTrendEmbedder
from visuelle2_tpu.models.norms import BatchNorm1d
from visuelle2_tpu.models.resnet import ResNetBackbone, STAGE_BLOCKS
from visuelle2_tpu.ops.attention import MultiHeadAttention
from visuelle2_tpu.ops.masks import causal_mask
from visuelle2_tpu.ops.positional import PositionalEncoding

GTM_V1_NORM_SCALAR = 1065.0  # GTM.py:321

BERT_DIM = 768


class TextFeaturizer:
    """Host-side frozen text featurizer (ingest-time, cached).

    Mirrors ``GTM.py:136-148``: description = "color fabric category", BERT
    token embeddings averaged over [1:-1].  Falls back to a deterministic
    hashed random projection when no pretrained weights are available.
    """

    def __init__(self, cat_dict, col_dict, fab_dict, use_bert: bool = True):
        self.inv_cat = {v: k for k, v in cat_dict.items()}
        self.inv_col = {v: k for k, v in col_dict.items()}
        self.inv_fab = {v: k for k, v in fab_dict.items()}
        # Which featurizer actually produced the features — recorded into the
        # trainers' hparams.json and checked at forecast/serve time: a
        # checkpoint trained on crc32 features scores garbage on real BERT
        # features (and vice versa), so a mismatch must be an ERROR, not a
        # silent wrong answer.  Flips to "bert-base-uncased" below on success.
        self.fingerprint = "hashed-crc32-v1"
        self._bert = None
        if use_bert:
            try:
                import os
                import socket

                # A local snapshot from `scripts/convert_pretrained.py
                # --arch bert` takes precedence — the supported way to get
                # real BERT features on this zero-egress host.
                local = os.environ.get("VISUELLE2_BERT_PATH", "")
                if local and os.path.isdir(local):
                    from transformers import pipeline

                    self._bert = pipeline("feature-extraction", model=local)
                    self.fingerprint = "bert-base-uncased"
                    return

                # On a zero-egress host huggingface otherwise burns ~40 s in
                # retry loops before erroring: probe DNS once (instant fail
                # offline) and flip transformers into offline mode BEFORE its
                # import (the flag is read at import time) so only the local
                # cache is consulted.
                try:
                    socket.getaddrinfo("huggingface.co", 443)
                except OSError:
                    os.environ.setdefault("HF_HUB_OFFLINE", "1")
                    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
                from transformers import pipeline

                self._bert = pipeline("feature-extraction", model="bert-base-uncased")
                self.fingerprint = "bert-base-uncased"
            except Exception as e:  # zero-egress: weights not downloadable
                print(f"[gtm_v1] BERT unavailable ({type(e).__name__}); "
                      "using deterministic hashed text features")

    def _hashed(self, text: str) -> np.ndarray:
        # Stable digest, NOT Python hash(): str hashing is salted per
        # interpreter (PYTHONHASHSEED), so hash()-seeded features would
        # differ between the training process and a later inference
        # process, making reloaded gtm_v1 checkpoints score garbage.
        import zlib

        vec = np.zeros(BERT_DIM, np.float32)
        for tok in text.split():
            rng = np.random.default_rng(zlib.crc32(tok.encode("utf-8")))
            vec += rng.standard_normal(BERT_DIM).astype(np.float32)
        return vec / max(1, len(text.split()))

    def __call__(self, category, color, fabric) -> np.ndarray:
        texts = [f"{self.inv_col[int(c)]} {self.inv_fab[int(f)]} {self.inv_cat[int(k)]}"
                 for k, c, f in zip(category, color, fabric)]
        if self._bert is not None:
            feats = self._bert(texts)
            return np.stack([np.asarray(x[0][1:-1], np.float32).mean(axis=0)
                             for x in feats])
        return np.stack([self._hashed(t) for t in texts])


class _FrozenImageTower(nn.Module):
    """Fully-frozen CNN feature map (``GTM.py:155-175``).

    The CNN child is named ``backbone`` like every other image encoder in
    the framework, so ``--pretrained_backbone`` splices into gtm_v1 too —
    the model whose accuracy depends on it most (nothing here finetunes)."""

    arch: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = ResNetBackbone(STAGE_BLOCKS[self.arch], dtype=self.dtype,
                               name="backbone")(x, train=False)
        return jax.lax.stop_gradient(feats).astype(jnp.float32)


class MemoryOnlyDecoderLayer(nn.Module):
    """Cross-attention + FFN, post-norm, returns attention weights
    (``GTM.py:199-232`` — deliberately no self-attention block)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, *, mask=None, deterministic=True):
        attn, weights = MultiHeadAttention(
            self.d_model, self.nhead, self.dropout, name="multihead_attn")(
            tgt, memory, memory, mask=mask, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm2")(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(attn))
        h = nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(tgt))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        ff = nn.Dense(self.d_model, name="linear2")(h)
        tgt = nn.LayerNorm(name="norm3")(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(ff))
        return tgt, weights


class GTMv1FusionNetwork(nn.Module):
    """``FusionNetwork`` (``GTM.py:54-88``)."""

    embedding_dim: int
    hidden_dim: int
    use_img: bool = True
    use_text: bool = True
    dropout: float = 0.2

    @nn.compact
    def __call__(self, img_feature_map, text_encoding, dummy_encoding, *,
                 train=False, deterministic=True):
        parts = []
        if self.use_img:
            pooled = img_feature_map.mean(axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
            parts.append(nn.Dense(self.embedding_dim, name="img_linear")(pooled))
        if self.use_text:
            parts.append(text_encoding)
        parts.append(dummy_encoding)
        x = jnp.concatenate(parts, axis=-1)
        D = x.shape[-1]
        x = BatchNorm1d(D, name="bn")(x, use_running_average=not train)
        x = nn.relu(nn.Dense(D, use_bias=False, name="fc1")(x))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.hidden_dim, name="fc2")(x)


class GTMv1(nn.Module):
    """Original GTM.  Batch contract: the standard dict plus
    ``text_features [B, 768]`` from :class:`TextFeaturizer`."""

    embedding_dim: int = 32
    hidden_dim: int = 64
    output_len: int = 12
    num_heads: int = 4
    num_layers: int = 1
    use_text: bool = True
    use_img: bool = True
    trend_len: int = 52
    num_trends: int = 3
    use_encoder_mask: bool = True
    autoregressive: bool = False
    image_arch: str = "resnet50"  # GTM.py:159 — ResNet-50, fully frozen
    image_dtype: Any = jnp.float32
    # Accepted for a uniform build() surface; inert — the tower is frozen
    # with stop_gradient, so there is no backward to rematerialize.
    image_remat: bool = False

    @nn.compact
    def __call__(self, batch, *, train=False):
        det = not train
        E, H = self.embedding_dim, self.hidden_dim

        x = normalize_images(batch["images"], dtype=self.image_dtype)
        # Fully frozen backbone: always inference-mode BN, gradients stopped.
        feats = _FrozenImageTower(self.image_arch, dtype=self.image_dtype,
                                  name="image_encoder")(x)
        if batch.get("img_idx") is not None:
            # Unique-image batch (loader dedup_images): expand to rows.
            feats = jnp.take(feats, batch["img_idx"], axis=0)

        dummy = DummyEmbedder(E, name="dummy_encoder")(
            batch["temporal"], deterministic=det)
        text = nn.Dropout(0.1, deterministic=det)(
            nn.Dense(E, name="text_fc")(batch["text_features"]))
        memory = GTrendEmbedder(
            self.output_len, H, num_trends=self.num_trends,
            trend_len=self.trend_len, use_mask=self.use_encoder_mask,
            num_layers=2, nhead=4, dropout=0.2, name="gtrend_encoder")(
            batch["gtrends"], deterministic=det)

        context = GTMv1FusionNetwork(
            E, H, use_img=self.use_img, use_text=self.use_text,
            name="static_feature_encoder")(
            feats, text, dummy, train=train, deterministic=det)

        def decode(tgt, mask=None):
            weights = None
            for i in range(self.num_layers):
                tgt, weights = MemoryOnlyDecoderLayer(
                    H, self.num_heads, H * 4, name=f"decoder{i}")(
                    tgt, memory, mask=mask, deterministic=det)
            return tgt, weights

        if self.autoregressive:
            N = context.shape[0]
            tgt = jnp.zeros((N, self.output_len, H), context.dtype)
            tgt = tgt.at[:, 0, :].set(context)
            tgt = PositionalEncoding(H, dropout=0.1, max_len=max(self.output_len, 12),
                                     name="pos_encoder")(tgt, deterministic=det)
            out, attn = decode(tgt, causal_mask(self.output_len))
            forecast = nn.Dense(1, name="decoder_fc")(out)[..., 0]
        else:
            out, attn = decode(context[:, None, :])
            forecast = nn.Dense(self.output_len, name="decoder_fc")(out[:, 0, :])
        forecast = nn.Dropout(0.2, deterministic=det)(forecast)
        return forecast.reshape(-1, self.output_len), attn
