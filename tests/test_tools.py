"""Offline data-prep tools on synthetic inputs."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_prep_megadepth_pairs(tmp_path):
    """Synthetic scene_info npz -> pair npy consumable by the dataset."""
    from prep_megadepth_pairs import main

    rng = np.random.default_rng(0)
    n_ims, n_pts = 4, 200
    # landscape PINHOLE intrinsics (principal point at center)
    K = np.array([[600.0, 0, 360], [0, 600, 240], [0, 0, 1]])
    # wide x-span so visibility differs between cameras (overlap < 1)
    X = rng.uniform([-3, -1.5, 4], [3, 1.5, 8], (n_pts, 3))
    poses, p2d, ndepth = [], [], []
    for i in range(n_ims):
        R = np.eye(3)
        t = np.array([0.4 * i, 0.0, 0.0])
        pose = np.eye(4)
        pose[:3, :3], pose[:3, 3] = R, t
        poses.append(pose)
        pc = X @ R.T + t
        proj = (pc / pc[:, 2:3]) @ K.T
        vis = {}
        nd = {}
        for p in range(n_pts):
            if 0 <= proj[p, 0] < 720 and 0 <= proj[p, 1] < 480:
                vis[p] = proj[p, :2]
                nd[p] = pc[p, 2]
        p2d.append(vis)
        ndepth.append(nd)

    overlap = np.zeros((n_ims, n_ims))
    for i in range(n_ims):
        for j in range(n_ims):
            if i < j:
                inter = len(p2d[i].keys() & p2d[j].keys())
                overlap[i, j] = inter / max(len(p2d[i]), len(p2d[j]))

    scene_dir = tmp_path / "MegaDepth_undistort" / "scene_info"
    scene_dir.mkdir(parents=True)
    np.savez(
        scene_dir / "0001.npz",
        overlap_matrix=overlap,
        image_paths=np.asarray(
            [f"Undistorted_SfM/0001/images/im{i}.jpg" for i in range(n_ims)],
            dtype=object,
        ),
        points3D_id_to_2D=np.asarray(p2d, dtype=object),
        points3D_id_to_ndepth=np.asarray(ndepth, dtype=object),
        intrinsics=np.stack([K] * n_ims),
        poses=np.stack(poses),
    )
    save_dir = str(tmp_path / "out")
    main([
        "--base_dir", str(tmp_path / "MegaDepth_undistort"),
        "--save_dir", save_dir,
        "--min_overlap_ratio", "0.3",
        "--exclude_tag", "",
        "--max_scene_pairs", "10",
    ])
    files = os.listdir(save_dir)
    assert len(files) == 1
    d = np.load(os.path.join(save_dir, files[0]), allow_pickle=True).item()
    assert "0001" in d
    pairs = d["0001"]["pairs"]
    assert len(pairs) > 0
    p = pairs[0]
    # fields the training dataset consumes
    for field in ("im1", "im2", "K1", "K2", "R", "t", "crop1", "crop2"):
        assert hasattr(p, field)
    # pure-translation scene: R identity, poses consistent
    np.testing.assert_allclose(p.R, np.eye(3), atol=1e-8)


def test_precompute_immatch_val_ovs(tmp_path):
    from precompute_immatch_val_ovs import main

    from patch2pix_tpu.data.colmap_model import write_model
    from tests.test_colmap_io import synthetic_model

    model_dir = tmp_path / "scene_a" / "dense" / "sparse"
    model_dir.mkdir(parents=True)
    write_model(*synthetic_model(n_ims=5, n_pts=12, seed=3), str(model_dir))
    main(["--data_root", str(tmp_path), "--overlaps", "0.1", "0.3"])
    d = np.load(model_dir / "ov_pairs.npy", allow_pickle=True).item()
    assert 0.1 in d and 0.3 in d
