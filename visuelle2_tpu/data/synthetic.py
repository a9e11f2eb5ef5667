"""Synthetic mini-VISUELLE2 generator.

Fabricates a dataset directory satisfying the full on-disk contract of the
reference (``/root/reference/train_dl.py:24-45``, ``dataset.py:74-78``):
``stfore_{train,test}.csv``, label dicts, ``vis2_gtrends_data.csv``, an
``images/`` JPEG tree and ``stfore_sales_norm_scalar.npy``.  Used by the test
suite and the benchmark when the real dataset is unavailable.

Sales are generated with a plausible launch-decay shape plus trend coupling so
models have real signal to learn.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

CATEGORIES = ["long sleeve", "culottes", "short sleeves", "doll dress"]
COLORS = ["black", "red", "blue", "white", "yellow"]
FABRICS = ["cotton", "wool", "silk", "polyester"]
NUM_STORES = 125  # reference train_dl.py:110 (store_num=125)


def make_synthetic_dataset(path: str, *, num_train: int = 64, num_test: int = 32,
                           image_size: int = 32, seed: int = 0,
                           write_images: bool = True,
                           rows_per_image: int = 1) -> str:
    """Create a synthetic dataset at ``path`` and return it.

    ``rows_per_image > 1`` makes consecutive rows share one product photo —
    the real VISUELLE2 structure (rows are per (product, store); ~100+ stores
    share each product's image), used to exercise/measure the unique-image
    dedup path (data/loader.py dedup_images)."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(path, "images"), exist_ok=True)

    for name, vals in (("category", CATEGORIES), ("color", COLORS),
                       ("fabric", FABRICS)):
        with open(os.path.join(path, f"{name}_labels.json"), "w") as f:
            json.dump({v: i for i, v in enumerate(vals)}, f)

    # Weekly gtrends covering 2015-2020 so every 52-week slice is full.
    dates = pd.date_range("2015-01-05", periods=320, freq="W-MON")
    trend_cols = CATEGORIES + COLORS + FABRICS
    tt = np.arange(len(dates))[:, None]
    phase = rng.uniform(0, 2 * np.pi, size=(1, len(trend_cols)))
    trend_vals = (
        50 + 30 * np.sin(2 * np.pi * tt / 52 + phase)
        + rng.normal(0, 5, size=(len(dates), len(trend_cols))))
    gdf = pd.DataFrame(trend_vals, index=dates, columns=trend_cols)
    gdf.index.name = "date"
    gdf.to_csv(os.path.join(path, "vis2_gtrends_data.csv"))

    def make_split(split: str, n: int, offset: int):
        cats = rng.choice(CATEGORIES, n)
        cols = rng.choice(COLORS, n)
        fabs = rng.choice(FABRICS, n)
        stores = rng.integers(0, NUM_STORES, n)
        release = rng.choice(pd.date_range("2017-01-02", "2019-06-03", freq="W-MON"), n)

        # Launch-decay sales: peak early then decay, scaled by a per-item level.
        weeks = np.arange(12)[None, :]
        level = rng.gamma(2.0, 6.0, size=(n, 1))
        decay = np.exp(-weeks / rng.uniform(2, 8, size=(n, 1)))
        sales = np.maximum(0, level * decay + rng.normal(0, 1.0, (n, 12))).round()
        sales = np.minimum(sales, 53.0)
        restock = sales.sum(axis=1) + rng.integers(0, 20, n)
        # A few items oversell their restock so the cleaning path is exercised.
        oversold = rng.random(n) < 0.2
        restock[oversold] = np.maximum(1, sales[oversold, :6].sum(axis=1))

        img_paths = [f"{split}_{offset + i // rows_per_image}.jpg"
                     for i in range(n)]
        if write_images:
            from PIL import Image

            for rel in dict.fromkeys(img_paths):
                arr = rng.integers(0, 255, (image_size, image_size, 3), dtype=np.uint8)
                Image.fromarray(arr).save(os.path.join(path, "images", rel), quality=85)

        df = pd.DataFrame({
            "image_path": img_paths,
            "category": cats,
            "color": cols,
            "fabric": fabs,
            "retail": stores,
            "release_date": pd.DatetimeIndex(release).strftime("%Y-%m-%d"),
            "restock": restock.astype(np.int64),
        })
        # Normalized weekly sales as the last 12 columns (reference stores the
        # already ÷53-normalized values; dataset.py:74-78 slices iloc[:, -13:]).
        for w in range(12):
            df[f"w{w}"] = sales[:, w] / 53.0
        df["restock"] = restock / 53.0
        df.to_csv(os.path.join(path, f"stfore_{split}.csv"), index=False)

    make_split("train", num_train, 0)
    make_split("test", num_test, num_train)
    np.save(os.path.join(path, "stfore_sales_norm_scalar.npy"), np.float64(53.0))
    return path
