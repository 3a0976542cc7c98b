"""End-to-end incremental SfM on a synthetic scene: ATE vs ground truth."""

import numpy as np
import pytest

from patch2pix_tpu.sfm.incremental import IncrementalSfM, export_colmap
from patch2pix_tpu.sfm.metrics import ate_rmse, umeyama_alignment
from patch2pix_tpu.sfm.tracks import build_tracks
from tests.test_sfm import make_scene


K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])


def make_pixel_scene(n_cams=6, n_pts=120, noise_px=0.3, seed=0):
    """Synthetic scene projected to PIXELS + pairwise match dict."""
    rng = np.random.default_rng(seed)
    Rs, ts, X, cam_idx, pt_idx, uv = make_scene(n_cams, n_pts, 0.0, seed)
    # visibility map
    vis = {}
    for c, p, n in zip(cam_idx, pt_idx, uv):
        px = K @ np.array([n[0], n[1], 1.0])
        vis[(c, p)] = px[:2] + noise_px * rng.standard_normal(2)
    pair_matches = {}
    for i in range(n_cams):
        for j in range(i + 1, n_cams):
            rows = []
            for p in range(n_pts):
                if (i, p) in vis and (j, p) in vis:
                    rows.append(np.concatenate([vis[(i, p)], vis[(j, p)]]))
            if len(rows) >= 16:
                pair_matches[(i, j)] = np.stack(rows)
    return Rs, ts, X, pair_matches


def test_build_tracks():
    Rs, ts, X, pair_matches = make_pixel_scene(noise_px=0.0)
    tracks = build_tracks(pair_matches, cell=4.0, min_track_len=2)
    assert len(tracks) > 50
    lens = [len(t) for t in tracks]
    assert max(lens) >= 3  # multi-view tracks got merged


def test_incremental_sfm_ate():
    Rs, ts, X, pair_matches = make_pixel_scene(noise_px=0.3, seed=1)
    sfm = IncrementalSfM(
        pair_matches, {i: K for i in range(len(Rs))},
        px_thres=2.0, log=lambda *_: None,
    )
    rec = sfm.run()
    assert len(rec.registered) == len(Rs)
    gt_centers = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
    est_centers = rec.centers()
    ate = ate_rmse(est_centers, gt_centers)
    # scene radius 4; sub-1% ATE expected at 0.3px noise
    assert ate < 0.04, f"ATE {ate}"


def test_export_colmap_roundtrip(tmp_path):
    from patch2pix_tpu.data.colmap_model import read_model

    Rs, ts, X, pair_matches = make_pixel_scene(noise_px=0.3, seed=2)
    sfm = IncrementalSfM(
        pair_matches, {i: K for i in range(len(Rs))},
        px_thres=2.0, log=lambda *_: None,
    )
    rec = sfm.run()
    export_colmap(rec, str(tmp_path), ext=".bin")
    cams, ims, pts = read_model(str(tmp_path), ext=".bin")
    assert len(ims) == len(rec.registered)
    assert len(pts) == len(rec.points)
    # poses survive the roundtrip
    first = ims[1]
    np.testing.assert_allclose(
        first.tvec, rec.ts[rec.registered[0]], atol=1e-6
    )
