"""Profiling / tracing (SURVEY.md §5 — the reference has only thop FLOP
counting and wall-clock prints; here: XLA cost analysis in eval/profiler plus
real device traces via jax.profiler for TensorBoard/Perfetto)."""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto.

    Example::

        with trace("/tmp/trace"):
            jax.block_until_ready(train_step(state, batch, rng))
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (``jax.profiler.TraceAnnotation``)."""
    return jax.profiler.TraceAnnotation(name)
