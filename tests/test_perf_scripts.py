"""Pure-host units of the perf measurement scripts (scripts/perf_*.py).

The measurement methodology itself can only be validated on hardware
(CLAUDE.md "Benchmark integrity"), but the calibration arithmetic and the
OOM backoff are plain Python — a wrong bound here silently records a
mis-measured series or kills an hour-long TPU batch run.
"""

import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "perf_dedup_series",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "perf_dedup_series.py"))
pds = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(pds)


def test_calibrate_iters_targets_device_time():
    # 10 ms/step, 2 s target -> 200 steps (memory cap not binding).
    assert pds._calibrate_iters(10.0, 8, 1, 2.0, 100.0) == 200


def test_calibrate_iters_memory_cap_binds():
    # d=1: one step's images = 128 * 299^2 * 3 B ~ 34.3 MB, and BOTH the
    # warm and timed stacks are device-resident, so a 1 GiB TOTAL cap
    # allows 1 GiB / (2 * 34.3 MB) = 15 steps even though the time target
    # wants far more (the advisor flagged the old per-stack reading: the
    # flag said GB but the device held twice that).
    got = pds._calibrate_iters(1.0, 8, 1, 2.0, 1.0)
    assert got == int(1.0 * 2**30 // (2 * 128 * 299 * 299 * 3))


def test_calibrate_iters_never_below_probe_and_never_above_512():
    assert pds._calibrate_iters(1000.0, 8, 1, 2.0, 100.0) == 8
    assert pds._calibrate_iters(0.001, 8, 10, 2.0, 100.0) == 512


def test_measure_with_backoff_halves_on_oom_only():
    calls = []

    def measure(iters, s):
        calls.append(iters)
        if iters > 100:
            raise RuntimeError("TPU backend error (RESOURCE_EXHAUSTED).")
        return {"ms": 1.0}

    probe = pds._measure_with_backoff(measure, 8, 400, s=0)
    assert calls == [400, 200, 100]
    assert probe == {"ms": 1.0, "iters": 100}

    # A non-OOM failure propagates immediately (no silent retry loop).
    def broken(iters, s):
        raise RuntimeError("INVALID_ARGUMENT: shape mismatch")

    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        pds._measure_with_backoff(broken, 8, 400, s=0)

    # OOM at the probe floor is terminal, not an infinite loop.
    def always_oom(iters, s):
        raise RuntimeError("RESOURCE_EXHAUSTED")

    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        pds._measure_with_backoff(always_oom, 8, 8, s=0)


def test_bench_smoke_mode_emits_driver_json_line():
    """VIS2_BENCH_SMOKE=1 runs bench.py's EXACT measurement logic (distinct
    per-step scan, floor subtraction, JSON contract) on CPU with a tiny
    model — the one rail that can catch a broken bench harness before the
    driver burns a TPU tunnel claim on it."""
    import json
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, VIS2_BENCH_SMOKE="1")
    out = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")], env=env, cwd=root,
        capture_output=True, text=True, timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "demand_forecasts_per_sec_per_chip"
    assert rec["unit"] == "forecasts/s/chip"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0


def test_pallas_convfloor_kernels_match_xla():
    """Interpret-mode parity of the conv-floor probe kernels
    (scripts/perf_pallas_convfloor.py): the bf16 M-tiled matmul matches the
    XLA dot, the int8 kernel is exact vs integer matmul, and the
    read-bandwidth reduction emits finite partials.  The TPU measurements
    are hardware-only; this pins their correctness."""
    import importlib.util as iu

    spec = iu.spec_from_file_location(
        "perf_pallas_convfloor",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "perf_pallas_convfloor.py"))
    mod = iu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.parity_check(interpret=True)


def test_convfloor_v2_harness_smoke():
    """The corrected conv-roofline harness (scripts/perf_convfloor_v2.py)
    end-to-end on CPU at a tiny shape: weight-perturb scan runs, the
    cost_analysis DCE guard passes (it counts the scan body once — a
    full-output carry keeps the conv alive), and the timing plumbing
    returns a positive per-step time."""
    import importlib.util as iu

    scripts = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts")
    import sys

    sys.path.insert(0, scripts)
    try:
        spec = iu.spec_from_file_location(
            "perf_convfloor_v2", os.path.join(scripts, "perf_convfloor_v2.py"))
        v2 = iu.module_from_spec(spec)
        spec.loader.exec_module(v2)
    finally:
        sys.path.remove(scripts)
    r = v2.measure_conv_shape("tiny", 8, 8, 8, 1, 1, dtypes=("bf16",),
                              target_s=0.05)
    assert r["bf16"]["secs"] > 0
    assert r["bf16"]["achieved_gbps"] > 0
