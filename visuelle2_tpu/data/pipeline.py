"""Vectorized VISUELLE-2 data pipeline.

Replaces the reference's per-item Python preprocessing loops
(``/root/reference/dataset.py:68-171``) with vectorized numpy transforms, and its
``torch.save`` tensor cache (``dataset.py:39-45``) with an ``.npz`` array cache.

On-disk dataset contract (unchanged from the reference, ``train_dl.py:24-45``):

* ``stfore_train.csv`` / ``stfore_test.csv`` — columns include ``release_date``,
  ``category``, ``color``, ``fabric``, ``retail``, ``image_path``; the last 13
  columns are the restock total followed by 12 weekly sales.
* ``category_labels.pt`` / ``color_labels.pt`` / ``fabric_labels.pt`` — str->int
  dicts (``.json`` files with the same stem are also accepted).
* ``vis2_gtrends_data.csv`` — date-indexed, one column per attribute value.
* ``images/`` — JPEG tree addressed by ``image_path``.
* ``stfore_sales_norm_scalar.npy`` — the rescale factor (53.0 fallback).

Array layout produced (stfore task, ``dataset.py:165-169`` equivalents):

* ``X``        float32 ``[N, W, 2]``   sliding 2-week sales windows
* ``y``        float32 ``[N, W, H]``   forecast targets
* ``cat/col/fab/store`` int32 ``[N]``
* ``temporal`` float32 ``[N, 4]``      day/week/month/year ÷ column max
* ``gtrends``  float32 ``[N, 3, 52]``  per-item min-max scaled trends

Demand task replaces ``X, y`` with ``ts`` float32 ``[N, 12]``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional

import numpy as np
import pandas as pd

TRAIN_WINDOW = 2  # reference dataset.py:68
NUM_SALES_WEEKS = 12
DEFAULT_TREND_LEN = 52
DEFAULT_NORM_SCALAR = 53.0  # reference forecast_dl.py:182


@dataclasses.dataclass
class Visuelle2Arrays:
    """The fully preprocessed dataset as host numpy arrays.

    ``X``/``y`` are None for the demand task; ``ts`` is None for stfore.
    ``image_paths`` index into the image store (see images.py).
    """

    demand: bool
    output_len: int
    cat: np.ndarray
    col: np.ndarray
    fab: np.ndarray
    store: np.ndarray
    temporal: np.ndarray
    gtrends: np.ndarray
    image_paths: np.ndarray
    X: Optional[np.ndarray] = None
    y: Optional[np.ndarray] = None
    ts: Optional[np.ndarray] = None
    split_idx: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return int(self.cat.shape[0])

    @property
    def num_windows(self) -> int:
        return 1 if self.demand else int(self.X.shape[1])

    def subset(self, n: int) -> "Visuelle2Arrays":
        """--quick_debug equivalent (reference train_dl.py:80-82)."""
        take = lambda a: None if a is None else a[:n]
        return Visuelle2Arrays(
            demand=self.demand,
            output_len=self.output_len,
            cat=take(self.cat), col=take(self.col), fab=take(self.fab),
            store=take(self.store), temporal=take(self.temporal),
            gtrends=take(self.gtrends), image_paths=take(self.image_paths),
            X=take(self.X), y=take(self.y), ts=take(self.ts),
            split_idx=take(self.split_idx),
        )


def clean_restocked_sales(restocks: np.ndarray, sales: np.ndarray):
    """Zero weekly sales past the restock total.

    Vectorized equivalent of the reference's per-item loop
    (``/root/reference/dataset.py:79-93``): the cumulative sum is computed on the
    *original* series, and every week whose running total exceeds the restock
    amount is zeroed.  Returns ``(clean_sales, split_idx)`` where ``split_idx``
    is the first zeroed week (0 when nothing was zeroed).
    """
    sales = np.asarray(sales, dtype=np.float64)
    restocks = np.asarray(restocks, dtype=np.float64)
    over = sales.cumsum(axis=1) > restocks[:, None]
    clean = np.where(over, 0.0, sales)
    any_over = over.any(axis=1)
    first_over = over.argmax(axis=1)
    split_idx = np.where(any_over, first_over, 0).astype(np.int64)
    return clean, split_idx


def frame_series(clean_sales: np.ndarray, train_window: int = TRAIN_WINDOW,
                 forecast_horizon: int = 1):
    """Sliding-window framing (reference ``dataset.py:96-109``).

    For a 12-week series there are ``12 - train_window - H + 1`` windows per
    item (10 for H=1, 1 for H=10).  Implemented with stride tricks rather than a
    per-item Python loop.
    """
    n, weeks = clean_sales.shape
    num_windows = weeks - train_window - forecast_horizon + 1
    if num_windows < 1:
        raise ValueError(
            f"horizon {forecast_horizon} too long for {weeks}-week series")
    sw = np.lib.stride_tricks.sliding_window_view(
        clean_sales, train_window + forecast_horizon, axis=1)
    sw = sw[:, :num_windows]
    X = sw[..., :train_window].astype(np.float32)
    y = sw[..., train_window:].astype(np.float32)
    return np.ascontiguousarray(X), np.ascontiguousarray(y)


def _minmax_rows(a: np.ndarray) -> np.ndarray:
    """Per-row min-max scaling matching sklearn MinMaxScaler semantics
    (``dataset.py:141-143``): constant rows map to 0."""
    lo = a.min(axis=-1, keepdims=True)
    hi = a.max(axis=-1, keepdims=True)
    denom = np.where(hi > lo, hi - lo, 1.0)
    return ((a - lo) / denom).astype(np.float32)


def extract_gtrends(sales_df: pd.DataFrame, gtrends: pd.DataFrame,
                    trend_len: int = DEFAULT_TREND_LEN) -> np.ndarray:
    """Per-item 52-week Google-Trends extraction (``dataset.py:119-146``).

    For each item, slice the 52 weeks before ``release_date`` for its
    category/color/fabric columns; when the date-bounded slice is short, fall
    back to everything up to the release date; min-max scale per item/trend.
    Date resolution is batched (one ``searchsorted`` over the trend index)
    and columns resolve via a name->position map, but the variable-length
    slice copy itself remains a per-item Python loop — ingest-only and
    cached (``load_dataset`` npz cache), so it is not on any hot path.
    """
    idx = gtrends.index
    values = gtrends.to_numpy(dtype=np.float64)
    col_pos = {name: i for i, name in enumerate(gtrends.columns)}

    release = pd.DatetimeIndex(sales_df["release_date"])
    start = release - pd.DateOffset(weeks=52)
    # .loc[a:b] is inclusive on both ends for a sorted DatetimeIndex.
    lo = idx.searchsorted(start, side="left")
    hi = idx.searchsorted(release, side="right")

    names = np.stack([
        sales_df["category"].to_numpy(),
        sales_df["color"].to_numpy(),
        sales_df["fabric"].to_numpy(),
    ], axis=1)  # [N, 3]

    n = len(sales_df)
    out = np.zeros((n, 3, trend_len), dtype=np.float32)
    for i in range(n):
        l, h = int(lo[i]), int(hi[i])
        for t in range(3):
            c = col_pos[names[i, t]]
            series = values[l:h, c][-52:][:trend_len]
            if len(series) < trend_len:
                series = values[:h, c][-52:][:trend_len]
            out[i, t, : len(series)] = series
    # Degenerate short-history rows keep their zero padding through the
    # per-row MinMaxScaler, so padded positions scale as real zeros.  The
    # reference would instead crash on a fully-empty slice
    # (dataset.py:134-143 fits MinMaxScaler on an empty array); we define
    # the behavior as all-zeros rather than inheriting the crash.
    return _minmax_rows(out)


def temporal_features_from_dates(release_date: pd.Series) -> np.ndarray:
    """day / isocalendar-week / month / year, each ÷ its column max
    (``dataset.py:148-156``)."""
    dt = pd.DatetimeIndex(release_date)
    feats = np.stack([
        dt.day.to_numpy(np.float64),
        dt.isocalendar().week.to_numpy(np.float64),
        dt.month.to_numpy(np.float64),
        dt.year.to_numpy(np.float64),
    ], axis=1)
    return (feats / feats.max(axis=0)).astype(np.float32)


def encode_attributes(sales_df: pd.DataFrame, cat_dict: Dict[str, int],
                      col_dict: Dict[str, int], fab_dict: Dict[str, int]):
    """String attribute -> int id via the label dicts; store id raw from
    ``retail`` (``dataset.py:158-161``)."""
    cat = np.asarray([cat_dict[v] for v in sales_df["category"]], np.int32)
    col = np.asarray([col_dict[v] for v in sales_df["color"]], np.int32)
    fab = np.asarray([fab_dict[v] for v in sales_df["fabric"]], np.int32)
    store = sales_df["retail"].to_numpy(np.int32)
    return cat, col, fab, store


def preprocess_dataframe(sales_df: pd.DataFrame, gtrends: pd.DataFrame,
                         cat_dict, col_dict, fab_dict, *, demand: bool,
                         output_len: int,
                         trend_len: int = DEFAULT_TREND_LEN) -> Visuelle2Arrays:
    """Full preprocessing for one split (``dataset.py:111-171`` equivalent)."""
    sales_block = sales_df.iloc[:, -13:].to_numpy(np.float64)
    restocks, sales = sales_block[:, 0], sales_block[:, -NUM_SALES_WEEKS:]

    X = y = ts = split_idx = None
    if demand:
        ts = sales_df.iloc[:, -NUM_SALES_WEEKS:].to_numpy(np.float32)
    else:
        clean, split_idx = clean_restocked_sales(restocks, sales)
        X, y = frame_series(clean, forecast_horizon=output_len)

    gt = extract_gtrends(sales_df, gtrends, trend_len)
    temporal = temporal_features_from_dates(sales_df["release_date"])
    cat, col, fab, store = encode_attributes(sales_df, cat_dict, col_dict, fab_dict)
    image_paths = sales_df["image_path"].to_numpy()

    return Visuelle2Arrays(
        demand=demand, output_len=output_len, cat=cat, col=col, fab=fab,
        store=store, temporal=temporal, gtrends=gt, image_paths=image_paths,
        X=X, y=y, ts=ts, split_idx=split_idx,
    )


def _load_label_dict(path_no_ext: str) -> Dict[str, int]:
    """Load a str->int label dict from ``<stem>.json`` or ``<stem>.pt``."""
    if os.path.isfile(path_no_ext + ".json"):
        with open(path_no_ext + ".json") as f:
            return {k: int(v) for k, v in json.load(f).items()}
    pt = path_no_ext + ".pt"
    if os.path.isfile(pt):
        import torch  # optional dependency, only for .pt label dicts

        return dict(torch.load(pt, weights_only=False))
    raise FileNotFoundError(f"no label dict at {path_no_ext}.(json|pt)")


def load_label_dicts(dataset_path: str):
    return tuple(
        _load_label_dict(os.path.join(dataset_path, f"{k}_labels"))
        for k in ("category", "color", "fabric")
    )


def load_norm_scalar(dataset_path: str) -> float:
    """``stfore_sales_norm_scalar.npy`` with the 53.0 fallback
    (``forecast_dl.py:176-182``)."""
    p = os.path.join(dataset_path, "stfore_sales_norm_scalar.npy")
    if os.path.isfile(p):
        return float(np.load(p))
    return DEFAULT_NORM_SCALAR


def _cache_key(split: str, demand: bool, output_len: int, trend_len: int) -> str:
    mode = "demand" if demand else f"stfore_h{output_len}"
    return f"visuelle2_{split}_processed_{mode}_t{trend_len}.npz"


def load_visuelle2(dataset_path: str, split: str, *, demand: bool,
                   output_len: int, trend_len: int = DEFAULT_TREND_LEN,
                   use_cache: bool = True) -> Visuelle2Arrays:
    """Load + preprocess one split, with an ``.npz`` cache (the array-native
    analogue of the reference's ``.pt`` cache, ``dataset.py:39-45``)."""
    cache_path = os.path.join(dataset_path, _cache_key(split, demand, output_len, trend_len))
    if use_cache and os.path.isfile(cache_path):
        try:
            with np.load(cache_path, allow_pickle=True) as z:
                return Visuelle2Arrays(
                    demand=bool(z["demand"]),
                    # The requested horizon, not the cached one: demand
                    # arrays are horizon-independent and share a cache key.
                    output_len=output_len,
                    cat=z["cat"], col=z["col"], fab=z["fab"], store=z["store"],
                    temporal=z["temporal"], gtrends=z["gtrends"],
                    image_paths=z["image_paths"],
                    X=z["X"] if "X" in z else None,
                    y=z["y"] if "y" in z else None,
                    ts=z["ts"] if "ts" in z else None,
                    split_idx=z["split_idx"] if "split_idx" in z else None,
                )
        except Exception:
            pass  # truncated/corrupt cache (interrupted write) -> rebuild

    sales_df = pd.read_csv(
        os.path.join(dataset_path, f"stfore_{split}.csv"), parse_dates=["release_date"])
    gtrends = pd.read_csv(
        os.path.join(dataset_path, "vis2_gtrends_data.csv"), index_col=[0], parse_dates=True)
    cat_dict, col_dict, fab_dict = load_label_dicts(dataset_path)

    arrays = preprocess_dataframe(
        sales_df, gtrends, cat_dict, col_dict, fab_dict,
        demand=demand, output_len=output_len, trend_len=trend_len)

    if use_cache:
        payload = dict(
            demand=arrays.demand, output_len=arrays.output_len, cat=arrays.cat,
            col=arrays.col, fab=arrays.fab, store=arrays.store,
            temporal=arrays.temporal, gtrends=arrays.gtrends,
            image_paths=arrays.image_paths,
        )
        for k in ("X", "y", "ts", "split_idx"):
            v = getattr(arrays, k)
            if v is not None:
                payload[k] = v
        # Atomic: an interrupted (or concurrently racing) first run must not
        # leave a truncated npz at the path os.path.isfile() trusts.
        tmp = f"{cache_path}.{os.getpid()}.tmp.npz"
        np.savez(tmp, **payload)
        os.replace(tmp, cache_path)
    return arrays
