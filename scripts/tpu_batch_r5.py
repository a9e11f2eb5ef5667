"""One-process TPU batch for the round-5 hardware measurements.

The axon tunnel claim costs 80s-20min per process (CLAUDE.md), so all
hardware work chains inside a single interpreter via runpy:

1. Scheduling-gap probe (VERDICT r5 item 3): full-vs-noskip backbone,
   per-stage attribution, maxpool isolation, stream-bandwidth anchor.
   Writes docs/schedgap_r5.json.
2. Trained-weight w8a8 accuracy sign-off (item 4): short real-dims train
   (ResNet-50 @299) then float-vs-w8a8 WAPE/MAE + rel_l2 on the same
   checkpoint.  Writes docs/w8a8_r5.json.
3. bench.py smoke (the driver runs it separately; this just confirms the
   headline did not regress under the r5 tree).

    python scripts/tpu_batch_r5.py
"""

import runpy
import sys
import time

HERE = __file__.rsplit("/", 1)[0]

t0 = time.time()

sys.argv = ["perf_sched_gap.py", "--out", "docs/schedgap_r5.json"]
runpy.run_path(f"{HERE}/perf_sched_gap.py", run_name="__main__")
print(f"[batch] sched-gap probe done at +{time.time() - t0:.0f}s", flush=True)

sys.argv = ["w8a8_trained_r5.py", "--out", "docs/w8a8_r5.json"]
runpy.run_path(f"{HERE}/w8a8_trained_r5.py", run_name="__main__")
print(f"[batch] trained w8a8 sign-off done at +{time.time() - t0:.0f}s",
      flush=True)

sys.argv = ["bench.py"]
runpy.run_path(f"{HERE}/../bench.py", run_name="__main__")
print(f"[batch] bench done at +{time.time() - t0:.0f}s", flush=True)
