"""Profiling utilities.

The reference's only instrumentation is per-batch wall clock in scripts/fold.py
(SURVEY §5.1). Here: jax.profiler trace capture (viewable in TensorBoard /
Perfetto) and a readback-honest timer (on tunneled backends block_until_ready
may not block, so timings must force a device->host transfer).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/esm_tpu_trace"):
    """Capture an XLA profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def _force(x) -> float:
    """Force execution with a device->host readback of a scalar."""
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.float32))


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 1, **kw):
    """Time fn(*args) honestly (readback-synced). Returns (seconds/iter, out)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
        _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
        _force(out)
    return (time.perf_counter() - t0) / iters, out
