"""One-process TPU batch for the round-3 perf re-measurements.

The axon tunnel claim costs 80s-20min per process (CLAUDE.md), so both
hardware measurements chain inside a single interpreter via runpy:

1. Re-record the dedup regression series under the stricter fully-distinct
   methodology (replaces the `r3` record flagged as an upper bound in
   docs/RESULTS_r3.md).
2. First recording of the train-step roofline (backward-pass attribution).
3. Re-record the per-model bench (docs/bench_all_models.json) under the
   floor-corrected, fully-distinct methodology (the checked-in numbers
   predate both fixes).

    python scripts/tpu_batch_r3.py
"""

import runpy
import sys
import time

HERE = __file__.rsplit("/", 1)[0]

t0 = time.time()
sys.argv = ["perf_dedup_series.py", "--label", "r3"]
runpy.run_path(f"{HERE}/perf_dedup_series.py", run_name="__main__")
print(f"[batch] dedup series done at +{time.time() - t0:.0f}s", flush=True)

sys.argv = ["perf_train_roofline.py", "--out", "docs/train_roofline_r3.json"]
runpy.run_path(f"{HERE}/perf_train_roofline.py", run_name="__main__")
print(f"[batch] train roofline done at +{time.time() - t0:.0f}s", flush=True)

sys.argv = ["bench_all_models.py"]
runpy.run_path(f"{HERE}/bench_all_models.py", run_name="__main__")
print(f"[batch] per-model bench done at +{time.time() - t0:.0f}s", flush=True)
