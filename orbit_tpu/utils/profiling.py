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


def enable_compile_cache(path: Optional[str]) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path`` (``~`` expanded;
    created if missing). Repeat driver/bench runs then reuse compiled XLA
    programs instead of paying the 20-40s-per-program TPU compile for every
    episode bucket. No-op (returns None) when ``path`` is falsy or the
    backend rejects the config (old JAX)."""
    if not path:
        return None
    import os

    import jax

    path = os.path.expanduser(path)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        return None
    return path


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


def measure_readback_overhead(n: int = 7) -> float:
    """Seconds of constant dispatch + host-readback overhead per sync.

    The axon-tunneled TPU turns every forced readback (the only true sync —
    ``block_until_ready`` is a no-op through the tunnel) into a ~70 ms round
    trip that is ENVIRONMENT tax, not model compute. The challenge's
    time-to-personalise metric (reference: single-step-learner.py:321-323)
    measures compute on local hardware, so the drivers subtract this measured
    constant from their timed syncs. Min-of-n of a trivial jitted op ≈ pure
    dispatch + RTT (a fresh computation each call defeats jax.Array's cached
    host value).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((), jnp.float32)
    np.asarray(f(x))  # compile + first transfer
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best
