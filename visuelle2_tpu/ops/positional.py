"""Sinusoidal positional encoding (``/root/reference/models/GTM_Visuelle2.py:13-28``)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div[: pe[:, 1::2].shape[1]])
    return pe


class PositionalEncoding(nn.Module):
    """x [B, L, D] -> dropout(x + pe[:L])."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 52

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        pe = jnp.asarray(sinusoidal_table(self.max_len, self.d_model))
        x = x + pe[None, : x.shape[1], :]
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)
