"""Statistical baselines (naive / SES / Holt) as vectorized JAX scans.

The reference wraps statsmodels in nested Python loops
(``/root/reference/models/Oracle.py:16-61``) — a pure CPU hot loop.  Here each
method is a closed-form computation vmapped over every window of every item in
one XLA program.

Semantics matched to the reference:

* **naive, teacher-forced** — last observed value of each window
  (``Oracle.py:19``); without TF, the first window's last value repeated
  across windows (``Oracle.py:21``).
* **SES** — fixed smoothing level α=0.3 with the *initial level estimated by
  least squares* (the statsmodels behaviour of
  ``SimpleExpSmoothing(x).fit(smoothing_level=0.3, optimized=True)``,
  ``Oracle.py:33``).  Because SES fitted values are affine in the initial
  level, the SSE-optimal ``l0`` has a closed form — no optimizer needed.
* **Holt** — ``Holt(x).fit()`` (``Oracle.py:52``) on a 2-point window fits the
  data exactly for *any* smoothing parameters, so the h-step forecast is the
  exact linear extrapolation ``x1 + h·(x1−x0)``; for longer windows we use
  least-squares-initialized level/trend with a small SSE grid over (α, β).
  The T>2 path is therefore an APPROXIMATION of statsmodels' MLE fit (which
  also estimates the initial state): measured within 8% of the series' max
  magnitude of an exact free-init SSE oracle, and pinned by recorded
  constants in ``tests/test_stats_and_metrics.py`` (the production SO-fore
  windows are always T=2, where the result is exact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def naive_forecast(X, teacher_forcing: bool):
    """``Oracle.naive_forecast`` (``Oracle.py:16-23``).

    X: [B, W, T] framed windows -> [B, W, 1].
    """
    if teacher_forcing:
        y_hat = X[:, :, -1]
    else:
        y_hat = jnp.repeat(X[:, 0, -1][:, None], X.shape[1], axis=-1)
    return y_hat[..., None]


def _ses_level_coeffs(x, alpha: float):
    """Run the SES recursion symbolically in the initial level.

    The level after seeing t points is ``l_t = c_t + d_t * l0`` with
    ``d_t = (1-α)^t``.  Returns the per-step fitted-value coefficients
    (c_0..c_{T-1}, d_0..d_{T-1}; fitted[t] = l_t|before x_t) plus the
    end-of-sample coefficients (c_T, d_T).
    """
    T = x.shape[0]

    def step(carry, xt):
        c, d = carry
        fitted = (c, d)
        c2 = alpha * xt + (1 - alpha) * c
        d2 = (1 - alpha) * d
        return (c2, d2), fitted

    (cT, dT), (cs, ds) = jax.lax.scan(step, (jnp.zeros(()), jnp.ones(())), x)
    return cs, ds, cT, dT


def ses_fit_forecast(x, horizon: int, alpha: float = 0.3):
    """Fit SES (fixed α, least-squares initial level) on 1-D ``x``; return the
    flat h-step forecast of length ``horizon``."""
    cs, ds, cT, dT = _ses_level_coeffs(x, alpha)
    # SSE(l0) = Σ (x_t − c_t − d_t·l0)²  →  l0* = Σ d_t(x_t−c_t) / Σ d_t²
    l0 = jnp.sum(ds * (x - cs)) / jnp.sum(ds * ds)
    level = cT + dT * l0
    return jnp.full((horizon,), level)


def ses_forecast(X, teacher_forcing: bool, alpha: float = 0.3):
    """``Oracle.ses_forecast`` (``Oracle.py:25-42``), vectorized.

    TF: fit per window, 1-step rolling forecast -> [B, W, 1].
    No TF: fit on the first window only, forecast W steps -> [B, 1, W]
    (the reference's exact output layout).
    """
    if teacher_forcing:
        f = jax.vmap(jax.vmap(lambda w: ses_fit_forecast(w, 1, alpha)))
        return f(X)  # [B, W, 1]
    f = jax.vmap(lambda item: ses_fit_forecast(item[0], item.shape[0], alpha))
    return f(X)[:, None, :]  # [B, 1, W]


def _holt_fit_forecast(x, horizon: int):
    """Holt linear-trend fit + h-step forecast for 1-D ``x``.

    For T==2 the SSE-zero solution gives forecast(h) = x1 + h·(x1−x0) exactly
    (independent of α/β).  For T>2, initialize l0=x0, b0=x1−x0 and grid-search
    (α, β) for minimal SSE, then extrapolate.
    """
    T = x.shape[0]
    if T == 2:
        slope = x[1] - x[0]
        h = jnp.arange(1, horizon + 1, dtype=x.dtype)
        return x[1] + h * slope

    grid = jnp.linspace(0.05, 0.95, 10)

    def sse_and_state(ab):
        a, b = ab

        def step(carry, xt):
            l, tr = carry
            pred = l + tr
            err = xt - pred
            l2 = a * xt + (1 - a) * (l + tr)
            tr2 = b * (l2 - l) + (1 - b) * tr
            return (l2, tr2), err * err

        # (l0, b0) is the state *before* the first observation: fitted[0] =
        # l0 + b0 must forecast x[0], so l0 = x0 − slope (consistent with the
        # exact T==2 solution above where l0 = 2·x0 − x1).
        slope0 = x[1] - x[0]
        (lT, bT), errs = jax.lax.scan(step, (x[0] - slope0, slope0), x)
        return jnp.sum(errs), lT, bT

    aa, bb = jnp.meshgrid(grid, grid)
    abs_ = jnp.stack([aa.ravel(), bb.ravel()], axis=1)
    sses, lTs, bTs = jax.vmap(sse_and_state)(abs_)
    best = jnp.argmin(sses)
    h = jnp.arange(1, horizon + 1, dtype=x.dtype)
    return lTs[best] + h * bTs[best]


def holt_forecast(X, teacher_forcing: bool):
    """``Oracle.holt_forecast`` (``Oracle.py:44-61``), vectorized."""
    if teacher_forcing:
        f = jax.vmap(jax.vmap(lambda w: _holt_fit_forecast(w, 1)))
        return f(X)  # [B, W, 1]
    f = jax.vmap(lambda item: _holt_fit_forecast(item[0], item.shape[0]))
    return f(X)[:, None, :]  # [B, 1, W]
