"""Common model plumbing: batch contract, window flatten/repeat helpers.

All models share the contract ``module.apply(variables, batch, train=...) ->
(forecast, aux)`` mirroring the reference's universal ``(forecast,
attn_weights)`` return (``/root/reference/models/GTM_Visuelle2.py:262``).

Batch dict fields (produced by ``data.loader.BatchLoader``):

* stfore: ``X [B, W, 2]``, ``y [B, W, H]``
* demand: ``ts [B, 12]``
* both:   ``cat/col/fab/store [B]``, ``temporal [B, 4]``,
          ``gtrends [B, 3, 52]``, ``images uint8 [B, H, W, 3]``, ``mask [B]``
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VocabSizes:
    """Embedding table sizes: len(dict)+1 / store_num+1 (train_dl.py:110,117)."""

    num_cat: int
    num_col: int
    num_fab: int
    num_store: int = 126

    @classmethod
    def from_dicts(cls, cat_dict, col_dict, fab_dict, store_num: int = 125):
        return cls(len(cat_dict) + 1, len(col_dict) + 1, len(fab_dict) + 1,
                   store_num + 1)


def flatten_windows(X):
    """[B, W, T] -> ([B·W, T, 1], B, W) — the reference's window flatten
    (CrossAttnRNN210.py:144-158) as a static reshape."""
    if X.ndim == 3:
        B, W, T = X.shape
        return X.reshape(B * W, T, 1), B, W
    B, T = X.shape
    return X.reshape(B, T, 1), B, 1


def repeat_windows(enc, num_windows: int):
    """Encode-once/repeat optimization (CrossAttnRNN210.py:169-173):
    item-major repeat matching the window flatten order."""
    if num_windows == 1:
        return enc
    return jnp.repeat(enc, num_windows, axis=0)
