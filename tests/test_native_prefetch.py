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
