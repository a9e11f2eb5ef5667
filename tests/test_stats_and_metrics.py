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


def test_holt_t_gt_2_free_init_sse_pinned():
    """ops/stats.py ``_holt_fit_forecast`` T>2: SSE minimized over (α, β)
    AND the free initial state — the closed-form inner least squares plus a
    zooming (α, β) grid (VERDICT r4 #5; ``Oracle.py:52``'s statsmodels
    objective).  Two pins so the fit can neither silently drift nor silently
    degrade: (a) recorded regression constants, (b) a bound vs an exact
    SSE-minimizing oracle (scipy Nelder-Mead over free smoothing params AND
    free initial state): forecasts agree within 1% of the series' max
    magnitude (measured ~1e-5)."""
    import jax.numpy as jnp
    from scipy.optimize import minimize

    from visuelle2_tpu.ops.stats import _holt_fit_forecast

    cases = {
        # series -> recorded _holt_fit_forecast(x, 3) output (regression pin)
        (3., 5., 4., 7., 8., 6., 9., 11.): (11.071446, 12.059547, 13.047647),
        (10., 8., 9., 5., 6., 3.): (2.33339, 1.047698, -0.237995),
    }

    def holt_sse_state(x, a, b, l0, b0):
        l, tr, sse = l0, b0, 0.0
        for xt in x:
            sse += (xt - (l + tr)) ** 2
            l2 = a * xt + (1 - a) * (l + tr)
            tr = b * (l2 - l) + (1 - b) * tr
            l = l2
        return sse, l, tr

    for series, recorded in cases.items():
        x = np.asarray(series, np.float32)
        got = np.asarray(_holt_fit_forecast(jnp.asarray(x), 3))
        np.testing.assert_allclose(got, recorded, rtol=1e-4)

        def obj(p, x=x):
            a = 1 / (1 + np.exp(-np.clip(p[0], -30, 30)))
            b = 1 / (1 + np.exp(-np.clip(p[1], -30, 30)))
            return holt_sse_state(x, a, b, p[2], p[3])[0]

        best = None
        for seed in range(6):
            r = np.random.default_rng(seed)
            p0 = np.concatenate([r.normal(0, 1, 2), [x[0], x[1] - x[0]]])
            res = minimize(obj, p0, method="Nelder-Mead",
                           options={"maxiter": 4000, "xatol": 1e-10,
                                    "fatol": 1e-12})
            if best is None or res.fun < best.fun:
                best = res
        a = 1 / (1 + np.exp(-best.x[0]))
        b = 1 / (1 + np.exp(-best.x[1]))
        _, lT, bT = holt_sse_state(x, a, b, best.x[2], best.x[3])
        oracle = lT + np.arange(1, 4) * bT
        scale = np.abs(x).max()
        assert np.abs(got - oracle).max() < 0.01 * scale, (got, oracle)
