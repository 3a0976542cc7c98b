"""The PhotoTourism immatch validation protocol on a synthetic scene.

Builds a COLMAP-format scene directory (poses + ov_pairs cache) and
drives eval_immatch_val_sets with an oracle matcher that projects the
true 3D points — the protocol must recover near-zero pose errors and
100% pass rates.
"""

import os

import numpy as np
import pytest

from patch2pix_tpu.data.colmap_model import (
    Camera,
    ImagePose,
    Point3D,
    rotmat2qvec,
    write_model,
)
from patch2pix_tpu.data.overlap import model_multi_ov_pairs
from patch2pix_tpu.evaluation.immatch import eval_immatch_val_sets
from tests.test_sfm import make_scene

K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])


@pytest.fixture
def synthetic_scene(tmp_path):
    Rs, ts, X, cam_idx, pt_idx, uv = make_scene(n_cams=5, n_pts=120, seed=9)
    scene = tmp_path / "fake_scene" / "dense"
    model_dir = scene / "sparse"
    im_dir = scene / "images"
    model_dir.mkdir(parents=True)
    im_dir.mkdir()

    cams, ims, pts = {}, {}, {}
    per_cam = {}
    vis_rng = np.random.default_rng(123)
    for c, p, n in zip(cam_idx, pt_idx, uv):
        # drop ~25% of observations per camera so co-visibility
        # overlaps land in [0.3, 1) (the protocol excludes overlap==1)
        if vis_rng.uniform() < 0.25:
            continue
        px = (K @ np.array([n[0], n[1], 1.0]))[:2]
        per_cam.setdefault(int(c), []).append((int(p), px))
    for c in range(len(Rs)):
        cid = c + 1
        cams[cid] = Camera(cid, "PINHOLE", 640, 480,
                           np.array([600.0, 600.0, 320.0, 240.0]))
        obs = per_cam[c]
        ims[cid] = ImagePose(
            id=cid, qvec=rotmat2qvec(Rs[c]), tvec=ts[c], camera_id=cid,
            name=f"im_{c}.jpg",
            xys=np.stack([px for _, px in obs]),
            point3D_ids=np.asarray([p + 1 for p, _ in obs], np.int64),
        )
        (im_dir / f"im_{c}.jpg").write_bytes(b"")  # paths only; oracle matcher
    for p in range(len(X)):
        pts[p + 1] = Point3D(
            p + 1, X[p], np.array([0, 0, 0], np.uint8), 0.0,
            np.zeros(0, np.int32), np.zeros(0, np.int32),
        )
    write_model(cams, ims, pts, str(model_dir))
    model_multi_ov_pairs(str(model_dir), [0.3])

    # oracle matcher keyed by file names
    rng = np.random.default_rng(0)

    def matcher(p1, p2):
        c1 = int(os.path.basename(p1).split("_")[1].split(".")[0])
        c2 = int(os.path.basename(p2).split("_")[1].split(".")[0])
        d1 = dict(per_cam[c1])
        d2 = dict(per_cam[c2])
        common = sorted(d1.keys() & d2.keys())
        m = np.stack([
            np.concatenate([
                d1[p] + 0.2 * rng.standard_normal(2),
                d2[p] + 0.2 * rng.standard_normal(2),
            ])
            for p in common
        ])
        return m, np.ones(len(m)), m

    return str(tmp_path), matcher


def test_immatch_protocol_oracle(synthetic_scene):
    data_root, matcher = synthetic_scene
    qt_mean, pass_rate, errs = eval_immatch_val_sets(
        matcher, data_root=data_root, rthres=0.5, sample_max=20,
        min_overlap=0.3, log=lambda *_: None,
    )
    assert len(errs.qt) > 0
    assert qt_mean < 2.0  # oracle matches -> near-perfect poses
    assert pass_rate[4] > 90.0  # qt < 5 deg nearly always
    assert errs.best_ckpt_score > 50.0
    # sampson distances of oracle matches vs GT F are tiny
    assert np.median(np.concatenate(errs.fdist)) < 2.0


def test_immatch_protocol_garbage_matcher(synthetic_scene):
    data_root, _ = synthetic_scene
    rng = np.random.default_rng(1)

    def bad_matcher(p1, p2):
        m = rng.uniform(0, 640, (50, 4))
        return m, np.ones(50), m

    qt_mean, pass_rate, errs = eval_immatch_val_sets(
        bad_matcher, data_root=data_root, rthres=0.5, sample_max=10,
        min_overlap=0.3, log=lambda *_: None,
    )
    # garbage matches: failures are bucketed, never raised, and the
    # pass rate collapses
    assert pass_rate[0] < 50.0
