"""Statistical baselines and metric definitions (Oracle.py / utils.py parity)."""

import numpy as np
import pytest

from visuelle2_tpu.ops.metrics import calc_error_metrics, eval_metrics, finalize_metrics, wape, mae
from visuelle2_tpu.ops.stats import naive_forecast, ses_forecast, holt_forecast, ses_fit_forecast


def test_calc_error_metrics_definition():
    gt = np.array([[1.0, 2.0], [3.0, 4.0]])
    fc = np.array([[1.5, 2.0], [2.0, 4.0]])
    m, w = calc_error_metrics(gt, fc)
    assert m == pytest.approx(round((0.5 + 0 + 1 + 0) / 4, 3))
    assert w == pytest.approx(round(100 * 1.5 / 10.0, 3))


def test_wape_mae_rescaled():
    gt = np.array([1.0, 0.0, 2.0])
    pred = np.array([0.5, 0.5, 2.0])
    assert float(mae(gt, pred, 53.0)) == pytest.approx(53.0 * 1.0 / 3)
    assert float(wape(gt, pred, 53.0)) == pytest.approx(100 * 1.0 / 3.0)


def test_eval_metrics_masked_accumulation():
    gt = np.array([[1.0, 2.0], [3.0, 4.0], [9.0, 9.0]])
    pred = np.array([[1.0, 1.0], [3.0, 5.0], [0.0, 0.0]])
    mask = np.array([1.0, 1.0, 0.0])  # last row is padding
    sums = {k: float(v) for k, v in eval_metrics(gt, pred, mask, norm_scalar=53.0).items()}
    out = finalize_metrics(sums)
    assert out["mae"] == pytest.approx(53.0 * 2.0 / 4)
    assert out["wape"] == pytest.approx(100 * 2.0 / 10.0)


def test_naive_forecast_shapes_and_values(rng):
    X = rng.random((4, 9, 2)).astype(np.float32)
    tf = np.asarray(naive_forecast(X, True))
    assert tf.shape == (4, 9, 1)
    np.testing.assert_allclose(tf[..., 0], X[:, :, -1])
    ntf = np.asarray(naive_forecast(X, False))
    np.testing.assert_allclose(ntf[:, :, 0], np.repeat(X[:, 0, -1:], 9, axis=1))


def test_ses_two_point_closed_form():
    # SES with α=0.3 on [x0, x1], LS-optimal l0:
    # fitted0=l0, fitted1=0.3 x0+0.7 l0 → minimize (x0−l0)²+(x1−0.3x0−0.7l0)²
    x = np.array([2.0, 5.0], np.float32)
    a = 0.3
    d = np.array([1.0, 1 - a])
    c = np.array([0.0, a * x[0]])
    l0 = np.sum(d * (x - c)) / np.sum(d * d)
    expected = a * x[1] + (1 - a) * (a * x[0] + (1 - a) * l0)
    got = np.asarray(ses_fit_forecast(x, 1))
    assert got[0] == pytest.approx(expected, rel=1e-5)


def test_ses_constant_series_forecasts_constant():
    x = np.full((6,), 3.5, np.float32)
    np.testing.assert_allclose(np.asarray(ses_fit_forecast(x, 3)), 3.5, rtol=1e-5)


def test_ses_forecast_layouts(rng):
    X = rng.random((3, 9, 2)).astype(np.float32)
    tf = np.asarray(ses_forecast(X, True))
    assert tf.shape == (3, 9, 1)
    ntf = np.asarray(ses_forecast(X, False))
    assert ntf.shape == (3, 1, 9)
    # Flat forecast: every step equals the first-window level.
    np.testing.assert_allclose(ntf[:, 0, 1:], ntf[:, 0, :-1], rtol=1e-5)


def test_holt_two_point_linear_extrapolation(rng):
    # Holt on a 2-point window fits exactly → forecast = 2·x1 − x0.
    X = rng.random((5, 9, 2)).astype(np.float32)
    tf = np.asarray(holt_forecast(X, True))
    np.testing.assert_allclose(tf[..., 0], 2 * X[:, :, 1] - X[:, :, 0], rtol=1e-4)
    ntf = np.asarray(holt_forecast(X, False))
    slope = X[:, 0, 1] - X[:, 0, 0]
    for h in range(9):
        np.testing.assert_allclose(ntf[:, 0, h], X[:, 0, 1] + (h + 1) * slope, rtol=1e-4)


def test_holt_longer_window_tracks_linear_trend():
    x = np.arange(1.0, 9.0, dtype=np.float32)  # perfect trend
    from visuelle2_tpu.ops.stats import _holt_fit_forecast

    f = np.asarray(_holt_fit_forecast(x, 3))
    np.testing.assert_allclose(f, [9.0, 10.0, 11.0], rtol=1e-3)
