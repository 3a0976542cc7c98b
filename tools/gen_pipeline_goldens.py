"""Generate golden reference-pipeline fixtures for torch-free parity tests.

Runs the ACTUAL reference PyTorch ``Patch2Pix.predict_fine``
(/root/reference/networks/patch2pix.py:250-276) with deterministic
numpy-seeded weights (tests/ref_loader.seeded_state_dict) on
deterministic images, and stores only its OUTPUTS plus the state-dict
shape map — the weights are regenerated from the seed at test time, so
the fixtures stay small (a few hundred KB) and the parity guarantee
survives environments without torch.

Usage: python tools/gen_pipeline_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.ref_loader import build_reference_model, state_dict_shapes
from tests.test_pipeline_e2e_parity import FIXDIR, seeded_images

CASES = {
    # small shapes keep the fixture fast to replay; the live torch test
    # covers the full 480x320 scale
    "s16": dict(change_stride=False, batch=2, h=128, w=192),
    "cs": dict(change_stride=True, batch=1, h=128, w=192),
    # validation-scale (max dim 1024) cases: pin the fast paths that
    # only engage at scale — fine_cap compaction, fused expansion
    # (M >= 2048), tap-sum alignment gates, one-hot gather — against
    # the reference (/root/reference/networks/patch2pix.py:250-276)
    "s16_1024": dict(change_stride=False, batch=1, h=768, w=1024),
    "cs_1024": dict(change_stride=True, batch=1, h=512, w=1024),
    # panc=8 TRAINING forward (anchor expansion + both regression
    # stages over the full unfiltered coarse set — the reference's
    # hot-loop path with ptmax=0, where filter_coarse is skipped
    # entirely, train_patch2pix.py:100-118); M = 2*h1w1*8 >= 2048
    # engages the fused expansion
    "train_panc8": dict(
        change_stride=False, batch=1, h=320, w=480, mode="train", panc=8
    ),  # M = 2*(10*15)*8 = 2400 proposals >= the fused-expansion gate
    # REAL natural images: the reference's bundled D2Net pairs
    # (/root/reference/examples/images/pair_{1,2,3}) through the eval
    # flexible-resize — closes the gap that seeded-noise fixtures
    # never exercise natural-image statistics (sky, repeated facades,
    # low-texture regions) on the CI parity path
    "real1_s16": dict(change_stride=False, batch=1, real_pair=1, imsize=512),
    "real2_cs": dict(change_stride=True, batch=1, real_pair=2, imsize=512),
    "real3_s16": dict(change_stride=False, batch=1, real_pair=3, imsize=512),
}
SEED = 0
IM_SEED = 10


def run_reference_train_forward(net, t1, t2, ksize=2):
    """The reference training forward WITHOUT proposal sampling:
    forward -> cal_coarse_matches -> shift_to_anchors (panc=8) ->
    mid regress -> fine regress (train_patch2pix.py:97-118 with
    ptmax=0, which skips filter_coarse)."""
    import torch

    with torch.no_grad():
        corr4d, delta4d, feats1, feats2 = net.forward(
            t1, t2, ksize=ksize, return_feats=True
        )
        coarse, scores = net.cal_coarse_matches(
            corr4d, delta4d, ksize=ksize, upsample=net.upsample, center=True
        )
        anchors = net.shift_to_anchors(coarse)
        mid, midp = net.forward_fine_match(
            feats1, feats2, anchors, psize=net.psize[0],
            ptype=net.ptype[0], regressor=net.regress_mid,
        )
        fine, finep = net.forward_fine_match(
            feats1, feats2, mid, psize=net.psize[1],
            ptype=net.ptype[1], regressor=net.regress_fine,
        )
    return anchors, mid, midp, fine, finep


def main():
    import argparse

    import torch

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of case tags to (re)generate")
    args = ap.parse_args()

    os.makedirs(FIXDIR, exist_ok=True)
    for tag, case in CASES.items():
        if args.only and tag not in args.only:
            continue
        panc = case.get("panc", 1)
        net, _ = build_reference_model(
            case["change_stride"], seed=SEED, panc=panc
        )
        if case.get("real_pair"):
            from tests.test_pipeline_e2e_parity import load_real_pair

            pair = load_real_pair(
                case["real_pair"], case["imsize"], case["change_stride"]
            )
            assert pair is not None, "reference example images missing"
            im1, im2 = pair
        else:
            im1 = seeded_images(
                case["batch"], case["h"], case["w"], seed=IM_SEED)
            im2 = seeded_images(
                case["batch"], case["h"], case["w"], seed=IM_SEED + 1)
        t1 = torch.from_numpy(im1.transpose(0, 3, 1, 2))
        t2 = torch.from_numpy(im2.transpose(0, 3, 1, 2))
        if case.get("mode") == "train":
            rc, rm, rms, rf, rfs = run_reference_train_forward(net, t1, t2)
        else:
            with torch.no_grad():
                rf, rfs, rm, rms, rc = net.predict_fine(
                    t1, t2, ksize=2, ncn_thres=0.0, mutual=True,
                    return_all=True,
                )
        arrays = {}
        for b in range(case["batch"]):
            arrays[f"coarse_{b}"] = np.asarray(rc[b].cpu(), np.float32)
            arrays[f"mid_{b}"] = np.asarray(rm[b].cpu(), np.float32)
            arrays[f"mid_scores_{b}"] = np.asarray(rms[b].cpu(), np.float32)
            arrays[f"fine_{b}"] = np.asarray(rf[b].cpu(), np.float32)
            arrays[f"fine_scores_{b}"] = np.asarray(rfs[b].cpu(), np.float32)
        meta = dict(
            seed=SEED, im_seed=IM_SEED, batch=case["batch"],
            h=case.get("h"), w=case.get("w"),
            change_stride=case["change_stride"],
            mode=case.get("mode", "eval"), panc=panc,
            real_pair=case.get("real_pair"), imsize=case.get("imsize"),
            shapes={k: list(s) for k, s in state_dict_shapes(net).items()},
        )
        path = os.path.join(FIXDIR, f"pipeline_golden_{tag}.npz")
        np.savez_compressed(path, meta=json.dumps(meta), **arrays)
        n = [len(arrays[f"coarse_{b}"]) for b in range(case["batch"])]
        print(f"{path}: matches per batch {n}, {os.path.getsize(path)} bytes",
              flush=True)


if __name__ == "__main__":
    main()
