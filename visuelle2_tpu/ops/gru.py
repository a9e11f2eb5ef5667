"""GRU cell + sequence layer.

The reference leans on cuDNN GRUs everywhere (sales/trend encoders,
``/root/reference/CrossAttnRNN210.py:123,135``; decoders).  TPU-native design:
a fused-gate cell — one ``[in, 3H]`` and one ``[H, 3H]`` matmul per step so the
MXU sees two large GEMMs — scanned over time with ``jax.lax.scan``.  Gate
order is (r, z, n), bit-compatible with ``torch.nn.GRU`` weight layout so
recorded torch weights convert directly (see ``from_torch_gru`` in tests).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def gru_cell_step(x, h, w_i, w_h, b_i, b_h):
    """One GRU step. x: [B, I], h: [B, H] -> new h [B, H].

    torch semantics: r = σ(Wx_r + bx_r + Wh_r h + bh_r), z likewise,
    n = tanh(Wx_n + bx_n + r·(Wh_n h + bh_n)), h' = (1−z)·n + z·h.
    """
    gi = x @ w_i + b_i          # [B, 3H]
    gh = h @ w_h + b_h          # [B, 3H]
    H = h.shape[-1]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


class GRU(nn.Module):
    """Single-layer batch-first GRU: [B, T, I] -> (outputs [B, T, H], h_T [B, H]).

    ``use_pallas=True`` runs the recurrence in the fused VMEM-resident TPU
    kernel (``ops/pallas/gru_seq.py``) with the identical parameter layout.
    """

    hidden_dim: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, h0: Optional[jax.Array] = None):
        B, T, I = x.shape
        H = self.hidden_dim
        # torch initializes all GRU weights U(-1/sqrt(H), 1/sqrt(H)).
        bound = 1.0 / jnp.sqrt(H)
        init = nn.initializers.uniform(scale=2 * bound)

        def shifted(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - bound

        w_i = self.param("w_i", shifted, (I, 3 * H))
        w_h = self.param("w_h", shifted, (H, 3 * H))
        b_i = self.param("b_i", shifted, (3 * H,))
        b_h = self.param("b_h", shifted, (3 * H,))

        if h0 is None:
            h0 = jnp.zeros((B, H), x.dtype)

        if self.use_pallas:
            from visuelle2_tpu.ops.pallas.gru_seq import fused_gru_sequence

            return fused_gru_sequence(x, w_i, w_h, b_i, b_h, h0)

        def step(h, xt):
            h2 = gru_cell_step(xt, h, w_i, w_h, b_i, b_h)
            return h2, h2

        xs = jnp.swapaxes(x, 0, 1)  # [T, B, I] for scan
        hT, ys = jax.lax.scan(step, h0, xs)
        return jnp.swapaxes(ys, 0, 1), hT


class GRUCellModule(nn.Module):
    """A standalone GRU cell sharing the GRU parameter layout — used by the
    autoregressive decoders where the step loop lives in the model's scan."""

    hidden_dim: int

    @nn.compact
    def __call__(self, x, h):
        I, H = x.shape[-1], self.hidden_dim
        bound = 1.0 / jnp.sqrt(H)
        init = nn.initializers.uniform(scale=2 * bound)

        def shifted(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - bound

        w_i = self.param("w_i", shifted, (I, 3 * H))
        w_h = self.param("w_h", shifted, (H, 3 * H))
        b_i = self.param("b_i", shifted, (3 * H,))
        b_h = self.param("b_h", shifted, (3 * H,))
        return gru_cell_step(x, h, w_i, w_h, b_i, b_h)
