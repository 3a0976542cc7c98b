"""Profiling / tracing utilities (SURVEY.md §5 "tracing" aux system).

The reference's telemetry is wall-clock prints + psutil/cuda memory
(/root/reference/utils/common/setup_helper.py:12-23); here the
first-class tools are jax.profiler traces and the pairs/s counter
(the BASELINE north-star numerator).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Streaming pairs/s (or items/s) counter with EMA smoothing."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.rate: Optional[float] = None
        self._t0: Optional[float] = None

    def tick(self, n_items: int) -> Optional[float]:
        now = time.perf_counter()
        if self._t0 is not None:
            inst = n_items / max(now - self._t0, 1e-9)
            self.rate = (
                inst if self.rate is None
                else self.alpha * inst + (1 - self.alpha) * self.rate
            )
        self._t0 = now
        return self.rate


def marginal_time(
    loop_fn: Callable[[int], object],
    iters_lo: int = 2,
    iters_hi: int = 10,
    repeats: int = 3,
) -> float:
    """Per-iteration seconds of an in-jit loop, free of dispatch latency.

    ``loop_fn(iters)`` must run ``iters`` iterations inside one jit and
    force a host sync (see bench.py; this is the only reliable timing
    method on relay-backed TPU runtimes whose block_until_ready is
    optimistic).
    """
    def timed(it):
        loop_fn(it)  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            loop_fn(it)
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(iters_hi) - timed(iters_lo)) / (iters_hi - iters_lo)
