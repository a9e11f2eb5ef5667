"""FLOPs + timing instrumentation.

Replaces the reference's thop MACs profile on the first test batch
(``/root/reference/forecast_dl.py:148-160``) with XLA's own compiled cost
analysis — exact for the compiled program, no tracing hooks.
"""

from __future__ import annotations

from typing import Optional


def compiled_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """Total FLOPs of the compiled program (None if the backend doesn't
    report cost analysis)."""
    flops, _ = compiled_stats(jitted_fn, *args, **kwargs)
    return flops


def compiled_stats(jitted_fn, *args, **kwargs):
    """``(flops, memory)`` of the compiled program, from ONE compile.

    ``memory`` is XLA's own buffer assignment in bytes — arguments,
    outputs, temp (activations/workspace), and the peak — the exact answer
    to "does this batch size fit in HBM?", which the reference's thop
    profile (forecast_dl.py:148-160) cannot give.  Either element is None
    when the backend doesn't report it.
    """
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
    except Exception:
        return None, None
    flops = memory = None
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns a per-computation list
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
    except Exception:
        pass
    try:
        m = compiled.memory_analysis()
        memory = {
            "argument_bytes": int(m.argument_size_in_bytes),
            "output_bytes": int(m.output_size_in_bytes),
            "temp_bytes": int(m.temp_size_in_bytes),
            "peak_bytes": int(m.peak_memory_in_bytes) or (
                int(m.argument_size_in_bytes) + int(m.output_size_in_bytes)
                + int(m.temp_size_in_bytes)),
        }
    except Exception:
        pass
    return flops, memory


def flops_per_sample(jitted_fn, batch_size: int, *args, **kwargs):
    """GFLOPs per sample, reported like forecast_dl.py:158-160."""
    total = compiled_flops(jitted_fn, *args, **kwargs)
    if total is None:
        return None
    return total / batch_size / 1e9

# NOTE: no generic repeated-dispatch ``throughput()`` helper lives here on
# purpose — per-dispatch timing on the axon relay is unsound (identical
# dispatches dedupe, independent ones overlap, block_until_ready can return
# early).  Throughput is measured only via the single-scan-with-fetch-barrier
# methodology: bench.py, eval/forecast.py::score_split's timed scan, and the
# scripts/perf_*.py family (CLAUDE.md "Benchmark integrity").
