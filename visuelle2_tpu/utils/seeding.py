"""Reproducibility helpers (``pl.seed_everything(21)`` counterpart,
``/root/reference/train_dl.py:20``)."""

from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int = 21):
    """Seed python + numpy and return a jax PRNG key.

    JAX randomness is functional — the returned key (and keys folded from it)
    is the single source of device-side randomness, so seeding is exact by
    construction rather than by global state.
    """
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.key(seed)
