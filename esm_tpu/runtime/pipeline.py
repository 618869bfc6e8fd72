"""Pipelined bulk-inference executor.

The reference's bulk CLIs run strictly serially (scripts/extract.py:88-131,
scripts/fold.py:161-196): tokenize -> forward -> readback -> save, each stage
blocking the next, so the accelerator idles during host work and the host
idles during device work. XLA dispatch is asynchronous, so the natural TPU
shape is a three-stage pipeline over the batch stream:

    prepare (host thread)  ->  dispatch (caller thread, async)  ->  consume
                                                                    (writer pool)

``dispatch`` returns device values without blocking; the readback (the real
synchronization point — see utils/profiling.py on why readback, not
``block_until_ready``) happens inside ``consume`` on a writer thread. With
``in_flight`` dispatched batches outstanding, the chip computes batch k+1
while batch k is read back and written to disk.

Everything is plain stdlib threading: the GIL is released during file IO and
device transfers, which is exactly where these threads spend their time.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import FIRST_EXCEPTION, ThreadPoolExecutor, wait
from dataclasses import dataclass
from typing import Any, Callable, Iterable, List, Optional


@dataclass
class PipelineStats:
    """Wall-clock accounting for a pipeline run."""

    batches: int = 0
    failed: int = 0
    total_s: float = 0.0
    prepare_s: float = 0.0  # summed across the prepare thread
    dispatch_s: float = 0.0  # time the caller thread spent in dispatch calls
    consume_s: float = 0.0  # summed across writer threads (incl. readback)
    dispatch_wait_s: float = 0.0  # caller thread starved waiting for prepare

    def summary(self) -> str:
        return (
            f"{self.batches} batches in {self.total_s:.2f}s "
            f"(prepare {self.prepare_s:.2f}s, dispatch {self.dispatch_s:.2f}s, "
            f"consume {self.consume_s:.2f}s overlapped; "
            f"input starvation {self.dispatch_wait_s:.2f}s)"
        )


class _PrepareThread(threading.Thread):
    """Runs ``prepare`` over the item stream, keeping ``depth`` results queued."""

    def __init__(
        self,
        items: Iterable[Any],
        prepare: Callable[[Any], Any],
        depth: int,
        abort: threading.Event,
    ):
        super().__init__(name="esm-tpu-prepare", daemon=True)
        self._items = items
        self._prepare = prepare
        self._abort = abort
        self.out: "queue.Queue" = queue.Queue(maxsize=depth)
        self.error: Optional[BaseException] = None
        self.elapsed = 0.0

    def _put(self, value) -> None:
        # bounded put that gives up promptly when the run is aborting, so the
        # thread can never stay parked on a full queue
        while not self._abort.is_set():
            try:
                self.out.put(value, timeout=0.1)
                return
            except queue.Full:
                continue

    def run(self) -> None:
        try:
            for idx, item in enumerate(self._items):
                if self._abort.is_set():
                    break  # don't keep tokenizing batches nobody will consume
                t0 = time.perf_counter()
                prepared = self._prepare(item)
                self.elapsed += time.perf_counter() - t0
                self._put((idx, item, prepared))
        except BaseException as e:  # propagated to the caller thread
            self.error = e
        finally:
            # unbounded put so the end-of-stream marker always lands even if
            # abort raced with a full queue
            self.out.put(None)


def run_pipeline(
    items: Iterable[Any],
    prepare: Callable[[Any], Any],
    dispatch: Callable[[Any], Any],
    consume: Callable[[int, Any, Any, Any], None],
    *,
    prefetch: int = 2,
    in_flight: int = 2,
    writers: int = 2,
    on_batch_error: Optional[Callable[[int, Any, BaseException], bool]] = None,
) -> PipelineStats:
    """Run ``consume(idx, item, prepared, dispatch(prepare(item)))`` for every
    item, with the three stages overlapped.

    Args:
      items: the batch stream (any iterable; consumed lazily).
      prepare: host-side batch construction (tokenization). Runs on one
        background thread, ``prefetch`` results buffered ahead.
      dispatch: launches device work; must NOT block on the result (jit
        dispatch is async). Runs on the caller thread, in item order, so
        device programs are enqueued back-to-back.
      consume: readback + output writing. Runs on a ``writers``-thread pool;
        at most ``in_flight`` dispatched results are outstanding (bounds
        device-result memory). Per-item ordering is NOT guaranteed across
        writer threads.
      on_batch_error: called when ``dispatch`` or ``consume`` raises for one
        batch; return True to skip the batch and continue (the reference
        fold CLI's OOM catch-and-skip, scripts/fold.py:163-178), False/None to
        abort the run with the original exception.

    Raises the first stage error (prepare errors surface after in-flight work
    drains; dispatch/consume errors abort promptly unless skipped).
    """
    if prefetch < 1 or in_flight < 1 or writers < 1:
        raise ValueError("prefetch, in_flight and writers must all be >= 1")

    stats = PipelineStats()
    t_start = time.perf_counter()
    stats_lock = threading.Lock()

    abort = threading.Event()
    producer = _PrepareThread(items, prepare, depth=prefetch, abort=abort)
    producer.start()

    slots = threading.BoundedSemaphore(in_flight)
    first_error: List[BaseException] = []

    def _fail(idx: int, item: Any, err: BaseException) -> None:
        if on_batch_error is not None and on_batch_error(idx, item, err):
            with stats_lock:
                stats.failed += 1
            return
        if not first_error:
            first_error.append(err)
        abort.set()

    def _consume(idx: int, item: Any, prepared: Any, result: Any) -> None:
        t0 = time.perf_counter()
        try:
            if not abort.is_set():
                consume(idx, item, prepared, result)
                with stats_lock:
                    stats.batches += 1
        except BaseException as e:
            _fail(idx, item, e)
        finally:
            slots.release()
            with stats_lock:
                stats.consume_s += time.perf_counter() - t0

    pool = ThreadPoolExecutor(max_workers=writers, thread_name_prefix="esm-tpu-write")
    futures = []
    try:
        while True:
            t0 = time.perf_counter()
            got = producer.out.get()
            stats.dispatch_wait_s += time.perf_counter() - t0
            if got is None:
                break
            idx, item, prepared = got
            if abort.is_set():
                continue  # drain the producer so it can exit
            slots.acquire()
            t0 = time.perf_counter()
            try:
                result = dispatch(prepared)
            except BaseException as e:
                slots.release()
                _fail(idx, item, e)
                continue
            finally:
                stats.dispatch_s += time.perf_counter() - t0
            futures.append(pool.submit(_consume, idx, item, prepared, result))
        wait(futures, return_when=FIRST_EXCEPTION)
    finally:
        abort.set()
        # unblock the producer if it is parked on a full queue
        try:
            while True:
                producer.out.get_nowait()
        except queue.Empty:
            pass
        pool.shutdown(wait=True)
        producer.join(timeout=30.0)

    if producer.error is not None:
        raise producer.error
    if first_error:
        raise first_error[0]

    if not producer.is_alive():  # don't read timing from a leaked thread
        stats.prepare_s = producer.elapsed
    stats.total_s = time.perf_counter() - t_start
    return stats
