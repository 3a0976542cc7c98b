#!/usr/bin/env python
"""Precompute overlap-pair lists for the PhotoTourism validation scenes.

CLI port of /root/reference/data_pairs/precompute_immatch_val_ovs.py:
for every scene under --data_root, compute 3D-point co-visibility
overlap scores from the COLMAP model and cache pair lists at multiple
overlap thresholds to <scene>/dense/sparse/ov_pairs.npy. The overlap
computation itself is the vectorised sparse incidence product in
patch2pix_tpu.data.overlap (orders faster than the reference's nested
intersect1d loop on large scenes).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from patch2pix_tpu.data.overlap import model_multi_ov_pairs  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--data_root", default="data/immatch_benchmark/val_dense"
    )
    ap.add_argument(
        "--overlaps", type=float, nargs="*", default=[0.1, 0.2, 0.3, 0.4, 0.5]
    )
    args = ap.parse_args(argv)

    for scene in sorted(os.listdir(args.data_root)):
        model_dir = os.path.join(args.data_root, scene, "dense/sparse")
        if not os.path.isdir(model_dir):
            continue
        print(f"scene {scene}:")
        d = model_multi_ov_pairs(model_dir, args.overlaps)
        for ov, pairs in sorted(d.items()):
            print(f"  ov>={ov}: {len(pairs)} pairs")


if __name__ == "__main__":
    main()
