#!/usr/bin/env python
"""Demo: match image pairs and save visualisations.

The role of the reference's ``examples/visualize_matches.ipynb``
(listed but missing upstream; purpose per /root/reference/README.md:33-34):
run Patch2Pix fine matching (or NCNet-only coarse matching) on example
image pairs and plot the correspondences.

Usage:
  python examples/demo_matching.py --ckpt patch2pix_pretrained.pth \
      --pairs dir_with_pair_subdirs --out out_dir
  # without a checkpoint, runs with random weights (pipeline smoke)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_matcher(args):
    if args.ckpt:
        from patch2pix_tpu.evaluation import (
            init_ncn_matcher,
            init_patch2pix_matcher,
        )

        if args.method == "nc":
            return init_ncn_matcher(args.ckpt, imsize=args.imsize)
        return init_patch2pix_matcher(
            args.ckpt, io_thres=args.io_thres, imsize=args.imsize
        )
    # random weights: demonstrates the pipeline without artifacts
    import jax
    import jax.numpy as jnp

    from patch2pix_tpu.config import ModelConfig
    from patch2pix_tpu.evaluation.matcher import Matcher
    from patch2pix_tpu.models.patch2pix import Patch2Pix

    model = Patch2Pix(config=ModelConfig(dtype="bfloat16").resolved())
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    dummy = jnp.zeros((1, 96, 128, 3), jnp.float32)
    variables = model.init(
        {"params": k1, "proposal": k2}, dummy, dummy, ksize=2, ptmax=8,
        train=False,
    )
    print("NOTE: no --ckpt given; matching with RANDOM weights")
    return Matcher(
        model, variables, io_thres=args.io_thres, imsize=args.imsize
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--method", choices=["patch2pix", "nc"], default="patch2pix")
    ap.add_argument(
        "--pairs", default="/root/reference/examples/images",
        help="directory of pair_*/ subdirs each holding two images",
    )
    ap.add_argument("--out", default="output/demo_matches")
    ap.add_argument("--imsize", type=int, default=1024)
    ap.add_argument("--io_thres", type=float, default=0.25)
    args = ap.parse_args(argv)

    from patch2pix_tpu.data.preprocess import load_image
    from patch2pix_tpu.utils.plotting import plot_matches

    matcher = build_matcher(args)
    os.makedirs(args.out, exist_ok=True)
    for pair_dir in sorted(os.listdir(args.pairs)):
        full = os.path.join(args.pairs, pair_dir)
        if not os.path.isdir(full):
            continue
        ims = sorted(
            f for f in os.listdir(full)
            if f.lower().endswith((".jpg", ".png", ".jpeg", ".ppm"))
        )
        if len(ims) < 2:
            continue
        p1, p2 = os.path.join(full, ims[0]), os.path.join(full, ims[1])
        matches, scores, _ = matcher.estimate_matches(p1, p2)
        out_path = os.path.join(args.out, f"{pair_dir}.png")
        plot_matches(
            np.asarray(load_image(p1), np.float64) / 255.0,
            np.asarray(load_image(p2), np.float64) / 255.0,
            matches, scores, save_path=out_path,
        )
        print(f"{pair_dir}: {len(matches)} matches -> {out_path}")


if __name__ == "__main__":
    main()
