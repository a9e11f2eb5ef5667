"""torch-semantics BatchNorm1d over [B, F] features.

Used by the GTM/M4FT fusion MLPs (``/root/reference/models/GTM_Visuelle2.py:158``,
``M4FT_Visuelle2.py:166``): batch statistics in train mode (biased variance for
normalization, unbiased for the running update, momentum 0.1, eps 1e-5),
running statistics in eval mode.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class BatchNorm1d(nn.Module):
    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, *, use_running_average: bool = True):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            mean = x32.mean(axis=0)
            var = x32.var(axis=0)
            if not self.is_initializing():
                n = x.shape[0]
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        return (x - mean) / jnp.sqrt(var + self.eps) * scale + bias
