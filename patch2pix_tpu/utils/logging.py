"""Logging, metrics and memory telemetry.

Capability parity with /root/reference/utils/common/setup_helper.py
(``lprint`` :32, ``config2str`` :46, ``count_parameters`` :7, memory
stats :12-23) and the visdom meter stack
(/root/reference/utils/common/visdom_helper.py): the visdom
line-plot schema becomes a CSV/JSONL metrics writer with the SAME
metric names, so training curves stay comparable without a plot
server.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from collections import defaultdict
from typing import Dict, Iterable, Optional, TextIO

import numpy as np


class Logger:
    """Console + append-mode file logging (the reference's ``lprint``)."""

    def __init__(self, log_path: Optional[str] = None):
        self._fh: Optional[TextIO] = None
        if log_path:
            os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
            self._fh = open(log_path, "a")

    def __call__(self, msg: str) -> None:
        print(msg)
        if self._fh is not None:
            self._fh.write(msg + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


def config2str(cfg) -> str:
    """Pretty-print a config (dataclass or argparse Namespace)."""
    if dataclasses.is_dataclass(cfg):
        d = dataclasses.asdict(cfg)
    else:
        d = vars(cfg)
    lines = ["Configs:"]
    for k, v in d.items():
        lines.append(f"  {k}: {v}")
    return "\n".join(lines)


def count_parameters(tree) -> int:
    """Total parameter count of a (sub)tree of arrays."""
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


class MetricsWriter:
    """Epoch-mean metric accumulator + JSONL writer.

    Mirrors the reference ``VisMeter`` contract
    (/root/reference/utils/common/visdom_helper.py:4-44): values
    accumulate per epoch, ``flush`` records the means and clears.

    ``append`` is LAZY: metric dicts (typically jax device scalars from
    an async-dispatched train step) are queued without conversion, and
    one batched ``device_get`` runs at ``means``/``flush``/``summary``
    time. The reference's per-step ``.item()`` host syncs
    (/root/reference/train_patch2pix.py:160-163) were one of its big
    throughput sins; a per-step ``float()`` here would reintroduce them
    by blocking on every step's metrics.
    """

    def __init__(self, out_path: Optional[str] = None, prefix: str = "train"):
        self.prefix = prefix
        self._vals: Dict[str, list] = defaultdict(list)
        self._pending: list = []
        self._path = out_path
        if out_path:
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)

    def append(self, metrics: Dict) -> None:
        """Queue one step's metrics (device arrays stay on device).

        Values may be scalars or stacked 1-D arrays (a scan over steps);
        stacked entries count as one appended value per element.
        """
        self._pending.append(dict(metrics))

    def _drain(self) -> None:
        if not self._pending:
            return
        try:
            import jax

            host = jax.device_get(self._pending)
        except ImportError:
            host = self._pending
        for m in host:
            for k, v in m.items():
                a = np.ravel(np.asarray(v, np.float64))
                self._vals[k].extend(float(x) for x in a[np.isfinite(a)])
        self._pending.clear()

    def means(self) -> Dict[str, float]:
        self._drain()
        return {k: float(np.mean(v)) for k, v in self._vals.items() if v}

    def flush(self, epoch: float) -> Dict[str, float]:
        means = self.means()
        if self._path:
            with open(self._path, "a") as f:
                f.write(
                    json.dumps(
                        {"epoch": epoch, "prefix": self.prefix, **means}
                    )
                    + "\n"
                )
        self._vals.clear()
        return means

    def summary(self, keys: Optional[Iterable[str]] = None) -> str:
        means = self.means()
        keys = keys or sorted(means)
        return " ".join(f"{k}={means[k]:.4f}" for k in keys if k in means)


def get_sys_mem() -> tuple:
    """(rss, vms) in GB, as the reference reports
    (/root/reference/utils/common/setup_helper.py:12-17)."""
    try:
        import psutil

        p = psutil.Process(os.getpid())
        info = p.memory_info()
        return info.rss / 1e9, info.vms / 1e9
    except ImportError:
        return 0.0, 0.0


def get_device_mem() -> Dict[str, float]:
    """Per-device memory stats (GB) from the JAX runtime — the TPU
    equivalent of torch.cuda.max_memory_allocated."""
    import jax

    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                k: v / 1e9
                for k, v in stats.items()
                if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
            }
    return out


def make_deterministic(seed: int) -> None:
    """Seed host-side RNGs. Device randomness is explicit PRNG keys in
    JAX, so this covers numpy/python only (the TPU path is always
    deterministic given the same keys)."""
    import random

    random.seed(seed)
    np.random.seed(seed)
