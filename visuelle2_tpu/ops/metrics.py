"""Forecast error metrics.

The reference computes WAPE/MAE in three places with three denominator
variants (``/root/reference/utils.py:4-12``, ``forecast_dl.py:191-192``,
``CrossAttnRNNDemand.py:422``); all agree for non-negative sales.  We
standardize on the absolute-value denominator ``Σ|gt|`` (``forecast_dl.py:192``)
and keep ``calc_error_metrics`` bit-compatible with ``utils.py`` (rounding
included) for the statistical-baseline CLI.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def calc_error_metrics(gt, forecasts):
    """(MAE, WAPE) rounded to 3 decimals — exact ``utils.py:4-12`` semantics
    (note: denominator ``sum(gt)``, not ``sum(|gt|)``)."""
    gt = np.asarray(gt, np.float64)
    forecasts = np.asarray(forecasts, np.float64)
    mae_v = np.abs(gt - forecasts).mean()
    wape_v = 100.0 * (np.sum(np.abs(gt - forecasts)) / np.sum(gt))
    return round(float(mae_v), 3), round(float(wape_v), 3)


def mae(gt, pred, norm_scalar: float = 1.0):
    """Mean absolute error on rescaled values (``CrossAttnRNN21.py:237``)."""
    return jnp.abs(gt * norm_scalar - pred * norm_scalar).mean()


def wape(gt, pred, norm_scalar: float = 1.0):
    """WAPE % = 100·Σ|gt−ŷ|/Σ|gt| on rescaled values (``forecast_dl.py:192``)."""
    num = jnp.sum(jnp.abs((gt - pred) * norm_scalar))
    den = jnp.sum(jnp.abs(gt * norm_scalar))
    return 100.0 * num / den


def eval_metrics(gt, pred, mask=None, norm_scalar: float = 53.0):
    """Masked metric sums for sharded one-pass evaluation.

    Returns partial sums (``abs_err``, ``abs_gt``, ``count``) that reduce
    exactly under ``psum`` across devices / accumulation across batches;
    finalize with :func:`finalize_metrics`.
    """
    gt = gt.reshape(gt.shape[0], -1)
    pred = pred.reshape(pred.shape[0], -1)
    if mask is None:
        mask = jnp.ones(gt.shape[0], gt.dtype)
    m = mask[:, None]
    abs_err = jnp.sum(jnp.abs(gt - pred) * m) * norm_scalar
    abs_gt = jnp.sum(jnp.abs(gt) * m) * norm_scalar
    count = jnp.sum(mask) * gt.shape[1]  # masked VALUES (rows x horizon)
    return {"abs_err": abs_err, "abs_gt": abs_gt, "count": count,
            "rows": jnp.sum(mask)}


def finalize_metrics(sums):
    """Partial sums -> {'mae', 'wape'}."""
    return {
        "mae": float(sums["abs_err"] / sums["count"]),
        "wape": float(100.0 * sums["abs_err"] / sums["abs_gt"]),
    }
