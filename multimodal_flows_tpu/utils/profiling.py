"""Profiling hooks (aux subsystem; absent in the reference, SURVEY §5).

Thin wrappers around `jax.profiler` so the trainer/sampler can capture
device traces without importing profiler plumbing inline, plus a
tunnel-safe timer: under remote TPU transports `block_until_ready` can
return before execution completes, so `device_timer` forces completion by
fetching a scalar reduction.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler device trace into `logdir` (no-op when None)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_completion(tree) -> float:
    """Return a host scalar derived from every float leaf, guaranteeing the
    computation finished (works where block_until_ready is unreliable)."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    acc = 0.0
    for x in leaves:
        if jnp.issubdtype(x.dtype, jnp.floating):
            acc += float(jnp.sum(x))
    return acc


def device_timer(fn, *args, iters: int = 3, warmup: int = 1):
    """Median wall time of `fn(*args)` with forced completion per call."""
    for _ in range(warmup):
        force_completion(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force_completion(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
