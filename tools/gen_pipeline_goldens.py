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
}
SEED = 0
IM_SEED = 10


def main():
    import torch

    os.makedirs(FIXDIR, exist_ok=True)
    for tag, case in CASES.items():
        net, _ = build_reference_model(case["change_stride"], seed=SEED)
        im1 = seeded_images(case["batch"], case["h"], case["w"], seed=IM_SEED)
        im2 = seeded_images(case["batch"], case["h"], case["w"], seed=IM_SEED + 1)
        t1 = torch.from_numpy(im1.transpose(0, 3, 1, 2))
        t2 = torch.from_numpy(im2.transpose(0, 3, 1, 2))
        with torch.no_grad():
            rf, rfs, rm, rms, rc = net.predict_fine(
                t1, t2, ksize=2, ncn_thres=0.0, mutual=True, return_all=True
            )
        arrays = {}
        for b in range(case["batch"]):
            arrays[f"coarse_{b}"] = rc[b].cpu().numpy()
            arrays[f"mid_{b}"] = rm[b].cpu().numpy()
            arrays[f"mid_scores_{b}"] = rms[b].cpu().numpy()
            arrays[f"fine_{b}"] = rf[b].cpu().numpy()
            arrays[f"fine_scores_{b}"] = rfs[b].cpu().numpy()
        meta = dict(
            seed=SEED, im_seed=IM_SEED, batch=case["batch"],
            h=case["h"], w=case["w"], change_stride=case["change_stride"],
            shapes={k: list(s) for k, s in state_dict_shapes(net).items()},
        )
        path = os.path.join(FIXDIR, f"pipeline_golden_{tag}.npz")
        np.savez_compressed(path, meta=json.dumps(meta), **arrays)
        n = [len(rc[b]) for b in range(case["batch"])]
        print(f"{path}: matches per batch {n}, {os.path.getsize(path)} bytes")


if __name__ == "__main__":
    main()
