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
    """
    import jax

    q: queue.Queue = queue.Queue(maxsize=max(size, 1))
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(jax.device_put(item, sharding))
            q.put(sentinel)
        except BaseException as e:  # surface errors in the consumer
            q.put(("__prefetch_error__", e))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] == "__prefetch_error__":
            raise item[1]
        yield item
