"""Host->device batch prefetching for the training loop.

The reference's DataLoader is built with defaults — ``num_workers=0``
(/root/reference/train_patch2pix.py:237) — so image decode + the
host->GPU copy sit serially inside its hot loop. Here a background
thread stages the next batches onto the device (optionally with a mesh
sharding) while the current step runs, so the jitted step never waits
on H2D traffic; combined with lazy metrics (utils/logging.py
MetricsWriter) the loop is free of per-step host syncs.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional


class _PrefetchError:
    """Private marker wrapping a producer-side exception.

    A marker class (instead of a tagged tuple) so batches that are
    themselves tuples can never be misclassified — and comparing a
    device array against a string can never raise.
    """

    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch_to_device(
    iterator: Iterator, size: int = 2, sharding=None
) -> Iterator:
    """Yield items from ``iterator``, staged onto device ahead of use.

    Args:
      iterator: yields pytrees of host arrays (e.g. batch dicts).
      size: number of batches staged ahead (2 = double buffering).
      sharding: optional sharding (or pytree of shardings matching the
        item structure) passed to ``jax.device_put`` — use the train
        step's batch NamedShardings on a mesh.

    The producer thread watches a stop event and uses bounded-timeout
    puts, so a consumer that abandons the generator early (e.g. the
    train CLI breaking at --steps_per_epoch) releases the thread and
    its staged device buffers instead of leaking them per epoch.
    """
    import jax

    q: queue.Queue = queue.Queue(maxsize=max(size, 1))
    done = object()
    stop = threading.Event()

    def _put(item) -> bool:
        """Put with a stop check; returns False once stopping."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterator:
                if not _put(jax.device_put(item, sharding)):
                    return
                if stop.is_set():
                    return
            _put(done)
        except BaseException as e:  # surface errors in the consumer
            _put(_PrefetchError(e))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is done:
                return
            if isinstance(item, _PrefetchError):
                raise item.exc
            yield item
    finally:
        # Runs on generator close()/GC as well as on normal return:
        # unblock the producer and drop any staged device buffers.
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        t.join(timeout=2.0)
