"""Background-thread window prefetcher (the async data-loader).

The reference's batch loop reads every scan synchronously before
computing (lidar_deform.py:392-418: SemLaserScan.open_scan per frame,
then deform). That was free next to its seconds-per-frame compute; at
~280 virtual scans/s the ~3-5 ms host-side read+pad+device-put would
dominate the ~2 ms device frame. A single worker thread stays ``depth``
windows ahead, overlapping disk IO and host padding with device compute
— JAX device puts are thread-safe, so the arrays arrive on device before
the consumer asks for them.

Index order is preserved exactly; worker exceptions re-raise at the
consuming ``__next__`` (annotated with the failing index) so IO errors
surface where the reference's would.
"""

from __future__ import annotations

import queue
import threading
import time


class Prefetcher:
    """Iterate ``load_fn(i)`` over ``indices``, loaded ``depth`` ahead.

    Yields ``(i, load_fn(i))`` in order. Use as an iterator or context
    manager; ``close()`` stops the worker (it also stops on its own when
    exhausted or after an error).
    """

    _STOP = object()

    def __init__(self, load_fn, indices, depth: int = 2):
        self._q = queue.Queue(maxsize=max(1, depth))
        self._closed = threading.Event()

        def work():
            try:
                for i in indices:
                    if self._closed.is_set():
                        return
                    try:
                        item = (i, load_fn(i), None)
                    except BaseException as e:  # re-raised at __next__
                        self._q.put((i, None, e))
                        return
                    self._q.put(item)
            finally:
                self._q.put(self._STOP)

        self._worker = threading.Thread(target=work, daemon=True,
                                        name="lt-prefetch")
        self._worker.start()

    def __iter__(self):
        return self

    def __next__(self):
        # after close() the queue may be fully drained (the STOP sentinel
        # included) with the worker gone — a blocking get() would hang
        # the caller forever instead of ending the iteration. Same once
        # the sentinel has been consumed: StopIteration must REPEAT on
        # further next() calls (iterator protocol), not block on a queue
        # nobody fills.
        if self._closed.is_set():
            raise StopIteration
        item = self._q.get()
        if item is self._STOP:
            self._closed.set()
            raise StopIteration
        i, value, err = item
        if err is not None:
            raise RuntimeError(f"prefetch of index {i} failed") from err
        return i, value

    def close(self, timeout: float = 10.0):
        self._closed.set()
        # Drain until the worker exits: a single drain can race with one
        # in-flight put — the worker then blocks forever on the final
        # _STOP put into the re-filled queue (leaked thread). But the
        # worker can ALSO be stuck inside load_fn itself (a device op
        # through a sick tunnel hangs for minutes — CLAUDE.md), so bound
        # the wait: past ``timeout`` we abandon the daemon thread (it
        # cannot block interpreter exit) instead of freezing the caller.
        deadline = time.monotonic() + timeout
        while self._worker.is_alive() and time.monotonic() < deadline:
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            self._worker.join(timeout=0.05)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
