"""Second round-4 TPU batch: the corrected conv roofline.

Chained in one interpreter (one tunnel claim, CLAUDE.md):

1. perf_convfloor_v2.py — corrected per-shape conv roofline (weight-perturb
   harness; the r3 input-perturb harness inflated bandwidth-bound shapes
   2-4x), all 24 ResNet-101@299 shapes in bf16 + the two worst also in f32,
   plus the artifact check and the epilogue/chain attribution extras.
   Writes docs/convfloor_v2_r4.json.
2. perf_pallas_convfloor.py re-run with the fixed harness (full-output
   carry kills the int8 DCE; auto-calibrated scan lengths replace the
   sub-floor 64-step scans).  Overwrites docs/convfloor_r4.json.

    python scripts/tpu_batch_r4b.py
"""

import runpy
import sys
import time

HERE = __file__.rsplit("/", 1)[0]

t0 = time.time()
sys.argv = ["perf_convfloor_v2.py", "--out", "docs/convfloor_v2_r4.json"]
runpy.run_path(f"{HERE}/perf_convfloor_v2.py", run_name="__main__")
print(f"[batch] convfloor v2 done at +{time.time() - t0:.0f}s", flush=True)

sys.argv = ["perf_convfloor_v2.py", "--out", "docs/convfloor_v2_r4.json",
            "--dtypes", "f32", "--conv_names", "s1_1x1a_wide", "s2_1x1a_wide",
            "--skip_extras"]
runpy.run_path(f"{HERE}/perf_convfloor_v2.py", run_name="__main__")
print(f"[batch] convfloor v2 f32 slice done at +{time.time() - t0:.0f}s",
      flush=True)

sys.argv = ["perf_backbone_isolation.py", "--out", "docs/backbone_iso_r4.json"]
runpy.run_path(f"{HERE}/perf_backbone_isolation.py", run_name="__main__")
print(f"[batch] backbone isolation done at +{time.time() - t0:.0f}s",
      flush=True)

sys.argv = ["perf_pallas_convfloor.py", "--out", "docs/convfloor_r4.json"]
runpy.run_path(f"{HERE}/perf_pallas_convfloor.py", run_name="__main__")
print(f"[batch] pallas probe re-run done at +{time.time() - t0:.0f}s",
      flush=True)
