"""Localization inner loop on a synthetic mapped scene."""

import numpy as np

from patch2pix_tpu.evaluation.localize import (
    MapImage,
    lift_matches,
    localize_query,
    map_images_from_colmap,
)
from tests.test_sfm import make_scene

K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])


def build_map_and_query(seed=0, noise=0.3):
    """Cameras 0..n-2 are the map; the last camera is the query."""
    rng = np.random.default_rng(seed)
    Rs, ts, X, cam_idx, pt_idx, uv = make_scene(n_cams=5, n_pts=150, seed=seed)
    db = []
    per_cam = {}
    for c, p, n in zip(cam_idx, pt_idx, uv):
        px = (K @ np.array([n[0], n[1], 1.0]))[:2]
        per_cam.setdefault(c, []).append((p, px))
    for c in range(4):
        obs = per_cam[c]
        db.append(
            MapImage(
                path=f"db_{c}.jpg",
                xys=np.stack([px for _, px in obs]),
                pts3d=np.stack([X[p] for p, _ in obs]),
            )
        )
    # perfect-oracle matcher: query pixel <-> db pixel of common points
    qc = 4
    qobs = {p: (K @ np.array([n[0], n[1], 1.0]))[:2]
            for c, p, n in zip(cam_idx, pt_idx, uv) if c == qc}

    def matcher(q_path, db_path):
        c = int(db_path.split("_")[1].split(".")[0])
        rows = []
        for p, px in per_cam[c]:
            if p in qobs:
                rows.append(np.concatenate([
                    qobs[p] + noise * rng.standard_normal(2), px
                ]))
        m = np.stack(rows)
        return m, np.ones(len(m)), m

    return Rs, ts, db, matcher


def test_lift_matches():
    db = MapImage(
        path="x", xys=np.array([[10.0, 10.0], [50.0, 50.0]]),
        pts3d=np.array([[0.0, 0, 1], [1.0, 0, 1]]),
    )
    matches = np.array([
        [1.0, 2.0, 11.0, 9.0],   # near obs 0
        [3.0, 4.0, 100.0, 100.0],  # far from everything
    ])
    q, X = lift_matches(matches, db, lift_radius=4.0)
    assert len(q) == 1
    np.testing.assert_allclose(X[0], [0, 0, 1])


def test_localize_query_recovers_pose():
    Rs, ts, db, matcher = build_map_and_query()
    res = localize_query(matcher, "query.jpg", K, db, px_thres=3.0)
    assert res.success
    # angular + positional accuracy vs GT camera 4
    c_gt = -Rs[4].T @ ts[4]
    np.testing.assert_allclose(res.camera_center, c_gt, atol=0.05)
    rot_err = np.degrees(np.arccos(np.clip(
        (np.trace(res.R.T @ Rs[4]) - 1) / 2, -1, 1)))
    assert rot_err < 1.0


def test_map_images_from_colmap(tmp_path):
    from patch2pix_tpu.data.colmap_model import write_model
    from tests.test_colmap_io import synthetic_model

    model = synthetic_model(n_ims=3, n_pts=10, seed=5)
    write_model(*model, str(tmp_path))
    maps = map_images_from_colmap(str(tmp_path), "/imgs")
    assert len(maps) >= 1
    for mi in maps.values():
        assert mi.xys.shape[0] == mi.pts3d.shape[0]
        assert mi.path.startswith("/imgs/")
