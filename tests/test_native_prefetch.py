"""Native C++ prefetch engine: correctness vs numpy fancy indexing."""

import numpy as np
import pytest

from visuelle2_tpu import native


@pytest.fixture(scope="module")
def engine():
    if not native.is_available():
        pytest.skip("no C++ toolchain available")
    return native.PrefetchEngine(num_threads=4)


def test_gather_matches_numpy(engine, rng):
    src = rng.integers(0, 255, (200, 17, 13, 3), dtype=np.uint8)
    idx = rng.integers(0, 200, 64).astype(np.int64)
    got = engine.gather(src, idx)
    np.testing.assert_array_equal(got, src[idx])


def test_async_submit_wait(engine, rng):
    src = rng.integers(0, 255, (500, 64), dtype=np.uint8)
    idx1 = rng.permutation(500)[:128].astype(np.int64)
    idx2 = rng.permutation(500)[:128].astype(np.int64)
    out1 = np.empty((128, 64), np.uint8)
    out2 = np.empty((128, 64), np.uint8)
    h1 = engine.submit(src, idx1, out1)
    h2 = engine.submit(src, idx2, out2)
    engine.wait(h1)
    engine.wait(h2)
    np.testing.assert_array_equal(out1, src[idx1])
    np.testing.assert_array_equal(out2, src[idx2])


def test_large_rows(engine, rng):
    # Rows bigger than the 2MB chunking threshold exercise multi-chunk jobs.
    src = rng.integers(0, 255, (8, 3 * 1024 * 1024), dtype=np.uint8)
    idx = np.array([5, 1, 7, 0], np.int64)
    got = engine.gather(src, idx)
    np.testing.assert_array_equal(got, src[idx])


def test_abandoned_iterator_completes_inflight_gather(synthetic_dataset):
    """Regression: dropping the loader iterator mid-epoch must not free the
    in-flight gather's output buffer under the C++ workers (heap corruption
    segfaulting later in unrelated code)."""
    import gc

    from visuelle2_tpu.data.images import ImageStore
    from visuelle2_tpu.data.loader import BatchLoader
    from visuelle2_tpu.data.pipeline import load_visuelle2

    arrays = load_visuelle2(synthetic_dataset, "train", demand=True, output_len=12)
    store = ImageStore.build(synthetic_dataset + "/images", arrays.image_paths,
                             size=32)
    loader = BatchLoader(arrays, store, 16, shuffle=True, drop_remainder=True)
    if loader._engine is None:
        pytest.skip("no native engine")
    for _ in range(20):
        next(iter(loader))
        gc.collect()
    # Full epoch still correct afterwards.
    ref = BatchLoader(arrays, store, 16, native_prefetch=False)
    for b1, b2 in zip(loader.__iter__(), ref):
        pass  # shuffled order differs; just ensure no crash
