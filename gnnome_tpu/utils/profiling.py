"""Profiling/tracing hooks (SURVEY.md §5: the reference only has ad-hoc
wall-clock prints; here: structured phase timers + optional XLA profiler
traces viewable in TensorBoard/Perfetto)."""
from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def maybe_trace(trace_dir: str | None):
    """jax.profiler trace into ``trace_dir`` when set, else a no-op."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


@contextmanager
def annotate(name: str):
    """Named region in profiler traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
