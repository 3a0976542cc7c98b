"""Per-program collective-communication accounting from compiled HLO.

The BASELINE.json scaling north star needs a communication-volume
model, and this environment has one physical chip — so instead of
measuring ICI traffic, the compiled XLA module is parsed for its
collective ops (all-reduce, all-gather, reduce-scatter,
collective-permute, all-to-all) and their operand byte sizes. That is
exactly the data XLA will move per execution (modulo while-loop trip
counts, which are reported separately as a multiplier hint).

Used by ``__graft_entry__.dryrun_multichip`` to log a comm table per
mesh size, and by tests to assert the expected scaling shape (e.g. the
distributed-BA psum volume is O(C^2), independent of points).
"""

from __future__ import annotations

import re
from typing import Dict

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

# e.g. "f32[4,512,3]{2,1,0}" or "bf16[8]"
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")

_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def _shape_bytes(shape_str: str) -> int:
    m = _SHAPE_RE.match(shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    if dt not in _DTYPE_BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def collective_stats(hlo_text: str) -> Dict[str, Dict[str, int]]:
    """Count collective ops + their output bytes in a compiled module.

    Returns {kind: {"count": n, "bytes": total_output_bytes}}. Ops
    inside while loops are counted once (statically); pair with the
    loop trip count for per-execution totals.
    """
    out: Dict[str, Dict[str, int]] = {}
    for line in hlo_text.splitlines():
        s = line.strip()
        # instruction lines look like: "%name = f32[...] all-reduce(...)"
        #  or tuple-shaped: "%name = (f32[...], f32[...]) all-reduce-start(...)"
        for kind in _COLLECTIVES:
            if f" {kind}(" in s or f" {kind}-start(" in s:
                eq = s.find("= ")
                if eq < 0:
                    continue
                rhs = s[eq + 2:]
                shapes = []
                if rhs.startswith("("):
                    close = rhs.find(")")
                    shapes = [p.strip() for p in rhs[1:close].split(",")]
                    # tuple elements may split dims across commas; re-scan
                    shapes = _SHAPE_RE.findall(rhs[:close])
                    nbytes = sum(
                        _shape_bytes(f"{dt}[{dims}]") for dt, dims in shapes
                    )
                else:
                    nbytes = _shape_bytes(rhs)
                d = out.setdefault(kind, {"count": 0, "bytes": 0})
                d["count"] += 1
                d["bytes"] += nbytes
                break
    return out


def format_comm_table(stats: Dict[str, Dict[str, int]]) -> str:
    if not stats:
        return "collectives: none"
    rows = [
        f"{k}: x{v['count']} {v['bytes'] / 1024:.1f} KiB"
        for k, v in sorted(stats.items())
    ]
    return "collectives: " + ", ".join(rows)
