"""One-process TPU batch for the round-4 hardware measurements.

The axon tunnel claim costs 80s-20min per process (CLAUDE.md), so all
hardware work chains inside a single interpreter via runpy:

1. Kernel-level probe of the narrow-1x1-conv floor (Pallas bf16/int8 vs the
   XLA dots + a read-bandwidth roofline) — VERDICT r4 item 4's bounded
   experiment.  Writes docs/convfloor_r4.json.
2. Dedup regression series re-record under the r4 tree (guards the
   beyond-speed-of-light dedup win against regressions).
3. bench.py smoke via its module path (the driver runs it separately; this
   run just confirms the headline did not regress with the r4 changes).

    python scripts/tpu_batch_r4.py
"""

import runpy
import sys
import time

HERE = __file__.rsplit("/", 1)[0]

t0 = time.time()
sys.argv = ["perf_pallas_convfloor.py", "--out", "docs/convfloor_r4.json"]
runpy.run_path(f"{HERE}/perf_pallas_convfloor.py", run_name="__main__")
print(f"[batch] conv-floor probe done at +{time.time() - t0:.0f}s", flush=True)

sys.argv = ["perf_dedup_series.py", "--label", "r4"]
runpy.run_path(f"{HERE}/perf_dedup_series.py", run_name="__main__")
print(f"[batch] dedup series done at +{time.time() - t0:.0f}s", flush=True)

sys.argv = ["bench.py"]
runpy.run_path(f"{HERE}/../bench.py", run_name="__main__")
print(f"[batch] bench done at +{time.time() - t0:.0f}s", flush=True)
