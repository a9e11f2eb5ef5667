"""Oracle: statistical baselines over framed windows
(``/root/reference/models/Oracle.py``), delegating to the vectorized JAX
implementations in ``ops.stats``.

The reference decides teacher forcing with one numpy coin per batch
(``Oracle.py:17,27,46``) where the "probability" is the boolean flag itself —
i.e. TF is deterministic given the flag; we keep that semantic.
"""

from __future__ import annotations

import dataclasses

import jax

from visuelle2_tpu.ops.stats import holt_forecast, naive_forecast, ses_forecast


@dataclasses.dataclass(frozen=True)
class Oracle:
    method: str = "naive"  # naive | ses | holt
    use_teacher_forcing: bool = False

    def __call__(self, X):
        """X: framed windows [B, W, T] -> forecasts (layout per method/TF,
        matching Oracle.py:16-61)."""
        tf = bool(self.use_teacher_forcing)
        if self.method == "naive":
            return naive_forecast(X, tf)
        if self.method == "ses":
            return ses_forecast(X, tf)
        if self.method == "holt":
            return holt_forecast(X, tf)
        raise ValueError(f"unknown method {self.method}")

    def jitted(self):
        return jax.jit(self.__call__)
