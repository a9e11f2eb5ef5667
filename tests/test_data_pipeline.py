"""Data pipeline tests: vectorized transforms vs loop-reference semantics
(the golden seams of /root/reference/dataset.py:68-171)."""

import numpy as np
import pandas as pd
import pytest

from visuelle2_tpu.data.pipeline import (
    clean_restocked_sales,
    frame_series,
    extract_gtrends,
    temporal_features_from_dates,
    load_visuelle2,
)
from visuelle2_tpu.data.images import ImageStore, normalize_images
from visuelle2_tpu.data.loader import BatchLoader


def _reference_clean(restocks, sales):
    # Loop semantics of dataset.py:79-93, re-derived for golden comparison.
    clean, split = [], []
    for i, ts in enumerate(np.array(sales, dtype=np.float64)):
        stock = restocks[i]
        if ts.sum() <= stock:
            clean.append(ts)
            split.append(0)
        else:
            mask = ts.cumsum() > stock
            sidx = np.where(mask)[0][0]
            ts = ts.copy()
            ts[mask] = 0
            clean.append(ts)
            split.append(sidx)
    return np.array(clean), np.array(split)


def test_clean_restocked_sales_matches_loop(rng):
    sales = rng.integers(0, 10, size=(50, 12)).astype(float)
    restocks = rng.integers(5, 60, size=50).astype(float)
    got, got_idx = clean_restocked_sales(restocks, sales)
    want, want_idx = _reference_clean(restocks, sales)
    np.testing.assert_allclose(got, want)
    np.testing.assert_array_equal(got_idx, want_idx)


@pytest.mark.parametrize("horizon,expected_windows", [(1, 10), (10, 1)])
def test_frame_series_window_counts(rng, horizon, expected_windows):
    # 12 − 2 − H + 1 windows per item (dataset.py:98).
    series = rng.random((7, 12))
    X, y = frame_series(series, forecast_horizon=horizon)
    assert X.shape == (7, expected_windows, 2)
    assert y.shape == (7, expected_windows, horizon)
    # Spot-check window alignment.
    np.testing.assert_allclose(X[3, 0], series[3, 0:2], rtol=1e-6)
    np.testing.assert_allclose(y[3, 0], series[3, 2: 2 + horizon], rtol=1e-6)
    if expected_windows > 1:
        np.testing.assert_allclose(X[3, 4], series[3, 4:6], rtol=1e-6)
        np.testing.assert_allclose(y[3, 4], series[3, 6: 6 + horizon], rtol=1e-6)


def test_extract_gtrends_scaling_and_shape():
    dates = pd.date_range("2016-01-04", periods=200, freq="W-MON")
    g = pd.DataFrame(
        {"catA": np.arange(200.0), "colB": 5.0 * np.ones(200), "fabC": np.sin(np.arange(200.0))},
        index=dates)
    df = pd.DataFrame({
        "category": ["catA", "catA"],
        "color": ["colB", "colB"],
        "fabric": ["fabC", "fabC"],
        "release_date": [dates[100], dates[60]],
    })
    out = extract_gtrends(df, g)
    assert out.shape == (2, 3, 52)
    # Per-item min-max scaling: monotone ramp maps to [0, 1].
    assert out[0, 0, 0] == pytest.approx(0.0)
    assert out[0, 0, -1] == pytest.approx(1.0)
    # Constant series maps to all zeros (sklearn MinMaxScaler semantics).
    np.testing.assert_allclose(out[0, 1], 0.0)


def test_extract_gtrends_short_history_fallback():
    dates = pd.date_range("2016-01-04", periods=80, freq="W-MON")
    g = pd.DataFrame({"c": np.arange(80.0), "k": np.arange(80.0), "f": np.arange(80.0)},
                     index=dates)
    df = pd.DataFrame({
        "category": ["c"], "color": ["k"], "fabric": ["f"],
        # Early release: <52 weeks of prior data → fallback .loc[:date][-52:]
        "release_date": [dates[30]],
    })
    out = extract_gtrends(df, g)
    assert out.shape == (1, 3, 52)
    # 31 real values scaled into the first 31 slots, zero-padding after.
    assert out[0, 0, 30] == pytest.approx(1.0)
    np.testing.assert_allclose(out[0, 0, 31:], 0.0)


def test_temporal_features_normalized():
    dates = pd.Series(pd.to_datetime(["2017-03-06", "2018-12-31"]))
    f = temporal_features_from_dates(dates)
    assert f.shape == (2, 4)
    assert f.max() <= 1.0 and (f > 0).all()


def test_load_visuelle2_end_to_end(synthetic_dataset):
    arrays = load_visuelle2(synthetic_dataset, "train", demand=False, output_len=1)
    assert arrays.X.shape[1] == 10 and arrays.X.shape[2] == 2
    assert arrays.y.shape[2] == 1
    assert arrays.gtrends.shape[1:] == (3, 52)
    assert arrays.temporal.shape[1] == 4
    # Cache round-trip must be identical.
    cached = load_visuelle2(synthetic_dataset, "train", demand=False, output_len=1)
    np.testing.assert_array_equal(arrays.X, cached.X)
    np.testing.assert_array_equal(arrays.gtrends, cached.gtrends)

    demand = load_visuelle2(synthetic_dataset, "test", demand=True, output_len=12)
    assert demand.ts.shape[1] == 12


def test_image_store_and_loader(synthetic_dataset):
    arrays = load_visuelle2(synthetic_dataset, "train", demand=False, output_len=1)
    store = ImageStore.build(
        synthetic_dataset + "/images", arrays.image_paths,
        cache_file=ImageStore.cache_path(synthetic_dataset, "train", 32), size=32)
    assert store.pixels.shape == (len(arrays), 32, 32, 3)

    loader = BatchLoader(arrays, store, batch_size=16, shuffle=True)
    batches = list(loader)
    assert len(batches) == len(loader)
    b = batches[-1]
    assert b["X"].shape == (16, 10, 2)
    assert b["images"].dtype == np.uint8
    # Tail batch padding is masked out.
    assert b["mask"].sum() == len(arrays) - 16 * (len(batches) - 1)

    norm = normalize_images(b["images"])
    assert norm.shape == b["images"].shape
    # uint8 128 → (128/255 − mean)/std for channel 0.
    expect = (128 / 255.0 - 0.485) / 0.229
    idx = np.argwhere(b["images"][..., 0] == 128)
    if len(idx):
        i = tuple(idx[0])
        assert float(norm[..., 0][i]) == pytest.approx(expect, rel=1e-5)


def test_windows_use_cleaned_series_but_demand_uses_raw(tmp_path):
    """dataset.py:111-117 — stfore windows frame the restock-cleaned series,
    demand ts is the raw last-12 columns."""
    import json

    import pandas as pd

    from visuelle2_tpu.data.pipeline import preprocess_dataframe

    dates = pd.date_range("2015-01-05", periods=200, freq="W-MON")
    g = pd.DataFrame({"c": np.arange(200.0), "k": np.arange(200.0),
                      "f": np.arange(200.0)}, index=dates)
    sales = np.arange(1, 13, dtype=float)  # cumsum exceeds restock early
    df = pd.DataFrame({
        "image_path": ["x.jpg"], "category": ["c"], "color": ["k"],
        "fabric": ["f"], "retail": [3],
        "release_date": [dates[150]], "restock": [10.0],
    })
    for w in range(12):
        df[f"w{w}"] = [sales[w]]
    df["release_date"] = pd.to_datetime(df["release_date"])

    st = preprocess_dataframe(df, g, {"c": 0}, {"k": 0}, {"f": 0},
                              demand=False, output_len=1)
    # cumsum(1,3,6,10,15,...) > 10 from week 5 (index 4) on -> zeros after
    assert st.split_idx[0] == 4
    clean = np.concatenate([sales[:4], np.zeros(8)])
    np.testing.assert_allclose(st.X[0, 0], clean[0:2])
    np.testing.assert_allclose(st.X[0, 4], clean[4:6])  # zeroed region

    dm = preprocess_dataframe(df, g, {"c": 0}, {"k": 0}, {"f": 0},
                              demand=True, output_len=12)
    np.testing.assert_allclose(dm.ts[0], sales)  # raw, not cleaned


def test_image_cache_invalidation_and_atomicity(synthetic_dataset, tmp_path):
    """The image cache must NOT be trusted blindly: a cache written by a
    different row subset (--quick_debug), a different --image_size, or an
    interrupted write has to rebuild instead of silently serving wrong
    pixels (or wedging every later run)."""
    arrays = load_visuelle2(synthetic_dataset, "train", demand=False,
                            output_len=1)
    cache = str(tmp_path / "imgs.npz")
    img_root = synthetic_dataset + "/images"

    # Seed the cache from a SUBSET of the rows (the quick_debug shape).
    sub = ImageStore.build(img_root, arrays.image_paths[:8],
                           cache_file=cache, size=32)
    assert len(sub) == 8

    # Full-row build with the same cache file must rebuild, not load 8 rows.
    full = ImageStore.build(img_root, arrays.image_paths,
                            cache_file=cache, size=32)
    assert len(full) == len(arrays)

    # Size change with the same cache file must rebuild too.
    small = ImageStore.build(img_root, arrays.image_paths,
                             cache_file=cache, size=16)
    assert small.pixels.shape[1] == 16

    # A truncated cache (interrupted write before atomicity existed, or a
    # bad copy) must rebuild rather than crash forever.
    with open(cache, "wb") as f:
        f.write(b"PK\x03\x04 garbage")
    again = ImageStore.build(img_root, arrays.image_paths,
                             cache_file=cache, size=32)
    assert len(again) == len(arrays) and again.pixels.shape[1] == 32

    # Stale-store/loader mismatch is a loud error, not a truncated epoch.
    with pytest.raises(ValueError, match="stale image cache"):
        BatchLoader(arrays, sub, batch_size=16)


def test_arrays_cache_corruption_rebuilds_and_demand_horizon(synthetic_dataset):
    """The preprocessed-arrays npz cache rebuilds on corruption (interrupted
    pre-atomic write), and a cached demand load returns the REQUESTED
    horizon: demand arrays are horizon-independent and share one cache key
    (pipeline.py::_cache_key), so the cached ``output_len`` must not pin the
    first caller's value."""
    import os

    from visuelle2_tpu.data.pipeline import _cache_key

    arrays = load_visuelle2(synthetic_dataset, "train", demand=False,
                            output_len=1)
    cache = os.path.join(synthetic_dataset, _cache_key("train", False, 1, 52))
    assert os.path.isfile(cache)
    with open(cache, "wb") as f:
        f.write(b"PK\x03\x04 truncated garbage")
    rebuilt = load_visuelle2(synthetic_dataset, "train", demand=False,
                             output_len=1)
    np.testing.assert_array_equal(rebuilt.X, arrays.X)
    np.testing.assert_array_equal(rebuilt.gtrends, arrays.gtrends)

    d12 = load_visuelle2(synthetic_dataset, "test", demand=True, output_len=12)
    d6 = load_visuelle2(synthetic_dataset, "test", demand=True, output_len=6)
    assert d12.output_len == 12 and d6.output_len == 6
    np.testing.assert_array_equal(d6.ts, d12.ts)
