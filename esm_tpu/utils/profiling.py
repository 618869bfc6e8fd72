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


_roundtrip_cache: Optional[float] = None


def tunnel_roundtrip(refresh: bool = False) -> float:
    """Dispatch+readback latency of a trivial op (median of 5). On the
    tunneled chip this is ~25-40 ms — it dominates sub-10 ms kernels, so
    amortized timings subtract it (see :func:`timed_amortized`)."""
    global _roundtrip_cache
    if _roundtrip_cache is None or refresh:
        x = jnp.ones((8, 128), jnp.float32)
        f = jax.jit(lambda x: x + 1.0)
        _force(f(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _force(f(x))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        _roundtrip_cache = ts[len(ts) // 2]
    return _roundtrip_cache


def timed_amortized(
    fn: Callable, *args, iters: int = 20, warmup: int = 2, repeats: int = 3, **kw
) -> float:
    """Per-iteration device seconds: ``iters`` independent async dispatches,
    ONE readback (the queue executes back-to-back on device), minus the
    measured tunnel roundtrip; best of ``repeats``. This is the CLAUDE.md
    benchmarking rule in one place — per-call readbacks (plain :func:`timed`)
    overstate sub-roundtrip kernels by the ~30 ms tunnel latency each.
    Size ``iters`` so total compute >> the roundtrip."""
    rt = tunnel_roundtrip()
    r = None
    for _ in range(warmup):
        r = fn(*args, **kw)
    _force(r)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args, **kw)
        _force(r)
        best = min(best, time.perf_counter() - t0)
    if best < 3.0 * rt:
        import warnings

        warnings.warn(
            f"timed_amortized: total measured time {best*1e3:.1f} ms is < 3x "
            f"the tunnel roundtrip ({rt*1e3:.1f} ms) — the subtraction is "
            "noise-dominated and per-dispatch host cost is a comparable "
            "fraction; raise iters, or use the MARGINAL method (rate from "
            "dt between two batch sizes, e.g. scripts_dev/tpu_t512_sweep.py) "
            "for sub-ms kernels",
            stacklevel=2,
        )
    return max((best - rt) / iters, 1e-9)
