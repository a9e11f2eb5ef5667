"""Additive attention masks (0 / −inf), matching the reference's torch masks."""

from __future__ import annotations

import math

import jax.numpy as jnp

NEG_INF = float("-inf")


def gcd_block_mask(size: int, forecast_horizon: int, dtype=jnp.float32):
    """Block-diagonal encoder mask restricting trend self-attention to
    contiguous blocks of ``gcd(size, horizon)`` steps
    (``/root/reference/models/GTM_Visuelle2.py:57-64``)."""
    split = math.gcd(size, forecast_horizon)
    idx = jnp.arange(size)
    same_block = (idx[:, None] // split) == (idx[None, :] // split)
    return jnp.where(same_block, 0.0, NEG_INF).astype(dtype)


def causal_mask(size: int, dtype=jnp.float32):
    """Square subsequent mask for AR decoding
    (``GTM_Visuelle2.py:209-213``)."""
    idx = jnp.arange(size)
    allowed = idx[None, :] <= idx[:, None]
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)
