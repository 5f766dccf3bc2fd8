"""Profiling/tracing hooks (aux-subsystem parity, SURVEY.md §5).

The reference's observability is wall-clock timers + thop MACs; on TPU the
equivalents are the evaluators' readback-synced timers, the XLA
cost-analysis ops counter, and — added here — ``jax.profiler`` device traces
viewable in TensorBoard/Perfetto:

    with trace("/tmp/orbit_trace"):
        learner.test(path)

or via the drivers' ``--profile_dir`` flag.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when ``profile_dir`` is set; no-op otherwise."""
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        yield


@contextlib.contextmanager
def timed(label: str, sink=None) -> Iterator[None]:
    """Wall-clock block timer; ``sink(label, seconds)`` or print."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink:
        sink(label, dt)
    else:
        print(f"[timed] {label}: {dt:.3f}s")
