"""Trace-time dispatch gates shared by the op library.

The sharded train step traces under ``spmd_mode()`` (see
train/step.py), which switches two dispatch classes:

  * Pallas kernels lower to XLA custom calls, which the SPMD
    partitioner cannot shard — inside a jit over a mesh it would
    all-gather their operands onto every device (for the NCN volume
    that is the whole activation set). ``pallas_allowed()`` returns
    False so every dispatch falls back to the pure-XLA formulation.
  * The conv4d fold paths' merged-flat (B*h1*w1) shift-slices cross
    pair boundaries, which under a data-sharded mesh lower as per-step
    halo collective-permutes; in SPMD mode they slice a per-batch
    (h1*w1) axis instead (slightly slower single-chip — measured
    25.3 -> 24.7 pairs/s at the change_stride eval scale — so the
    merged form stays the single-chip default).

Together these keep the compiled step's collective set exactly the
gradient all-reduce (tests/test_train_step.py
test_sharded_train_step_collectives_exact). Dispatch decisions are
static Python, so the gate only needs to hold during tracing.
"""

from __future__ import annotations

from contextlib import contextmanager

_SPMD = False


def spmd_mode() -> bool:
    return _SPMD


def pallas_allowed() -> bool:
    return not _SPMD


@contextmanager
def spmd_safe_dispatch():
    global _SPMD
    prev = _SPMD
    _SPMD = True
    try:
        yield
    finally:
        _SPMD = prev


no_pallas = spmd_safe_dispatch  # legacy alias
