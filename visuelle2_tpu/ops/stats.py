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
  exact linear extrapolation ``x1 + h·(x1−x0)``.  For T>2 the fit minimizes
  SSE over (α, β) AND the free initial state (l0, b0) — the same objective
  statsmodels' least-squares Holt fit solves.  The state recursion is affine
  in (l0, b0), so the inner problem is exact 2-parameter linear least
  squares; the outer (α, β) search is a vmapped zooming grid.  Measured
  within 1% of the series' max magnitude of a scipy Nelder-Mead free-init
  SSE oracle, pinned by recorded constants in
  ``tests/test_stats_and_metrics.py`` (the production SO-fore windows are
  always T=2, where the result is exact).
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


def _holt_affine_scan(x, a, b):
    """Run the Holt recursion with the state written affinely in the FREE
    initial state: ``l_t = cl + dl·l0 + el·b0``, ``tr_t = ct + dt·l0 + et·b0``
    (the update rules are affine in (l, tr), so the coefficients propagate
    exactly).  Returns the per-step fitted-value coefficients (fitted_t =
    l + tr before seeing x_t) and the end-of-sample state coefficients."""

    def step(carry, xt):
        cl, dl, el, ct, dt, et = carry
        fc, fd, fe = cl + ct, dl + dt, el + et          # fitted = l + tr
        cl2 = a * xt + (1 - a) * fc                     # l' = a·x + (1-a)(l+tr)
        dl2, el2 = (1 - a) * fd, (1 - a) * fe
        ct2 = b * (cl2 - cl) + (1 - b) * ct             # tr' = b(l'-l)+(1-b)tr
        dt2 = b * (dl2 - dl) + (1 - b) * dt
        et2 = b * (el2 - el) + (1 - b) * et
        return (cl2, dl2, el2, ct2, dt2, et2), (fc, fd, fe)

    zero, one = jnp.zeros((), x.dtype), jnp.ones((), x.dtype)
    init = (zero, one, zero, zero, zero, one)           # l = l0, tr = b0
    return jax.lax.scan(step, init, x)


def _holt_free_init_sse(x, ab):
    """For fixed (α, β), minimize SSE over the free initial state in closed
    form (2-parameter linear least squares) — statsmodels' objective.
    Returns (SSE*, lT, bT) at the optimal (l0, b0)."""
    a, b = ab
    (cl, dl, el, ct, dt, et), (fc, fd, fe) = _holt_affine_scan(x, a, b)
    r = x - fc
    g11, g12, g22 = fd @ fd, fd @ fe, fe @ fe
    lam = 1e-7 * (g11 + g22) + 1e-30                    # ridge for degeneracy
    det = (g11 + lam) * (g22 + lam) - g12 * g12
    l0 = ((g22 + lam) * (fd @ r) - g12 * (fe @ r)) / det
    b0 = ((g11 + lam) * (fe @ r) - g12 * (fd @ r)) / det
    resid = r - fd * l0 - fe * b0
    return resid @ resid, cl + dl * l0 + el * b0, ct + dt * l0 + et * b0


def _holt_fit_forecast(x, horizon: int):
    """Holt linear-trend fit + h-step forecast for 1-D ``x``.

    For T==2 the SSE-zero solution gives forecast(h) = x1 + h·(x1−x0) exactly
    (independent of α/β).  For T>2, minimize SSE over (α, β, l0, b0): the
    initial state in closed form per (α, β) (see ``_holt_free_init_sse``) and
    (α, β) by a vmapped 3-round zooming grid over [1e-4, 1]², keeping the
    global best across rounds.
    """
    T = x.shape[0]
    if T == 2:
        slope = x[1] - x[0]
        h = jnp.arange(1, horizon + 1, dtype=x.dtype)
        return x[1] + h * slope

    G = 17
    lo = jnp.full((2,), 1e-4, x.dtype)
    hi = jnp.ones((2,), x.dtype)
    best = (jnp.asarray(jnp.inf, x.dtype), jnp.zeros((), x.dtype),
            jnp.zeros((), x.dtype))
    for _ in range(3):
        ga = jnp.linspace(lo[0], hi[0], G)
        gb = jnp.linspace(lo[1], hi[1], G)
        aa, bb = jnp.meshgrid(ga, gb)
        ab = jnp.stack([aa.ravel(), bb.ravel()], axis=1)
        sses, lTs, bTs = jax.vmap(_holt_free_init_sse, in_axes=(None, 0))(
            x, ab)
        i = jnp.argmin(sses)
        take = sses[i] < best[0]
        best = tuple(jnp.where(take, new, old)
                     for new, old in zip((sses[i], lTs[i], bTs[i]), best))
        step = (hi - lo) / (G - 1)
        lo = jnp.clip(ab[i] - step, 1e-4, 1.0)
        hi = jnp.clip(ab[i] + step, 1e-4, 1.0)
    h = jnp.arange(1, horizon + 1, dtype=x.dtype)
    return best[1] + h * best[2]


def holt_forecast(X, teacher_forcing: bool):
    """``Oracle.holt_forecast`` (``Oracle.py:44-61``), vectorized."""
    if teacher_forcing:
        f = jax.vmap(jax.vmap(lambda w: _holt_fit_forecast(w, 1)))
        return f(X)  # [B, W, 1]
    f = jax.vmap(lambda item: _holt_fit_forecast(item[0], item.shape[0]))
    return f(X)[:, None, :]  # [B, 1, W]
