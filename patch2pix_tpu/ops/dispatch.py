"""Trace-time dispatch gates shared by the op library.

``no_pallas()``: Pallas kernels lower to XLA custom calls, which the
SPMD partitioner cannot shard — inside a jit over a mesh it would
all-gather their operands onto every device (for the NCN volume that
is the whole activation set). The sharded train step traces under this
context so every dispatch falls back to the pure-XLA formulation,
keeping the compiled step's collective set exactly the gradient
all-reduce (see tests/test_train_step.py
test_sharded_train_step_collectives_exact). Dispatch decisions are
static Python, so the gate only needs to hold during tracing.
"""

from __future__ import annotations

from contextlib import contextmanager

_PALLAS_OK = True


def pallas_allowed() -> bool:
    return _PALLAS_OK


@contextmanager
def no_pallas():
    global _PALLAS_OK
    prev = _PALLAS_OK
    _PALLAS_OK = False
    try:
        yield
    finally:
        _PALLAS_OK = prev
