"""Op-level attribution of the bench loop via a jax.profiler trace.

The stage profiler's sum (87.5 ms at change_stride) undershoots the
bench (103.9 ms); marginal stage timing cannot see where the fused
whole-pipeline program spends the difference. This captures an xplane
trace of the in-jit bench loop and prints the top HLO ops by self time
(parsed with tensorboard_plugin_profile, no TensorBoard UI needed).

Usage: python tools/profile_trace.py [--change_stride] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--change_stride", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    import bench

    variables, predict_loop = bench.build(change_stride=args.change_stride)
    im1 = jax.random.normal(
        jax.random.PRNGKey(1), (bench.BATCH, bench.H, bench.W, 3))
    im2 = jax.random.normal(
        jax.random.PRNGKey(2), (bench.BATCH, bench.H, bench.W, 3))
    # compile + warm outside the trace
    float(predict_loop(variables, im1, im2, args.iters))

    log_dir = tempfile.mkdtemp(prefix="p2p_trace_")
    jax.profiler.start_trace(log_dir)
    float(predict_loop(variables, im1, im2, args.iters))
    jax.profiler.stop_trace()

    pbs = glob.glob(
        os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not pbs:
        raise SystemExit(f"no xplane.pb under {log_dir}")
    print_top_ops(pbs[0], args.top)


def print_top_ops(pb_path: str, top: int) -> None:
    """Aggregate device-plane event durations per op name, grouped by a
    coarse kind prefix (tensorboard_plugin_profile's converter is broken
    against the installed TF, so the xplane proto is read directly)."""
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(pb_path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if not plane.name.startswith("/device:"):
            continue
        for line in plane.lines:
            total = defaultdict(int)
            count = defaultdict(int)
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                total[name] += ev.duration_ps
                count[name] += 1
            if not total:
                continue
            gtotal = sum(total.values())
            print(
                f"\n== {plane.name} line '{line.name}' — "
                f"{gtotal / 1e9:.2f} ms total =="
            )
            for name, ps in sorted(
                total.items(), key=lambda kv: -kv[1]
            )[:top]:
                print(
                    f"{ps / 1e9:9.2f} ms {100 * ps / gtotal:5.1f}% "
                    f"x{count[name]:<4d} {name[:130]}"
                )


if __name__ == "__main__":
    main()
