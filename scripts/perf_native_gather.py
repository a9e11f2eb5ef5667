"""Host data-plane: C++ threaded image gather vs single-thread numpy.

The per-batch image gather (128 x 299x299x3 uint8 = 34 MB) dominates host
batch assembly; the native engine (visuelle2_tpu/native) both parallelizes
the copy and overlaps it with the consumer (double-buffered in BatchLoader).
This measures the raw gather and the end-to-end loader iteration rate.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from visuelle2_tpu import native  # noqa: E402
from visuelle2_tpu.data.images import ImageStore  # noqa: E402

N_IMAGES, BATCH, IMAGE, ROUNDS = 1024, 128, 299, 20


def main():
    rng = np.random.default_rng(0)
    pixels = rng.integers(0, 255, (N_IMAGES, IMAGE, IMAGE, 3)).astype(np.uint8)
    store = ImageStore(pixels)
    idx = [rng.integers(0, N_IMAGES, BATCH) for _ in range(ROUNDS)]

    t0 = time.perf_counter()
    for i in idx:
        _ = pixels[i]  # numpy fancy-index gather (single thread)
    t_np = (time.perf_counter() - t0) / ROUNDS

    out = {"numpy_gather_ms": round(t_np * 1e3, 2),
           "native_available": native.is_available()}
    if native.is_available():
        eng = native.PrefetchEngine()
        # raw gather (submit+wait back to back)
        bufs = [np.empty((BATCH, IMAGE, IMAGE, 3), np.uint8) for _ in range(2)]
        h = eng.submit(pixels, np.ascontiguousarray(idx[0], np.int64), bufs[0])
        eng.wait(h)  # warm the pool
        t0 = time.perf_counter()
        for r, i in enumerate(idx):
            h = eng.submit(pixels, np.ascontiguousarray(i, np.int64),
                           bufs[r % 2])
            eng.wait(h)
        t_nat = (time.perf_counter() - t0) / ROUNDS
        out["native_gather_ms"] = round(t_nat * 1e3, 2)
        out["speedup"] = round(t_np / t_nat, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
