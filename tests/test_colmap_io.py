"""COLMAP model/database I/O roundtrips + overlap computation."""

import sqlite3

import numpy as np
import pytest

from patch2pix_tpu.data.colmap_model import (
    Camera,
    ImagePose,
    Point3D,
    qvec2rotmat,
    read_model,
    rotmat2qvec,
    write_model,
)
from patch2pix_tpu.data.colmap_db import (
    ColmapDatabase,
    image_ids_to_pair_id,
    pair_id_to_image_ids,
)
from patch2pix_tpu.data.overlap import cal_overlap_scores, model_multi_ov_pairs


def synthetic_model(n_ims=3, n_pts=10, seed=0):
    rng = np.random.default_rng(seed)
    cams = {
        1: Camera(1, "SIMPLE_RADIAL", 640, 480,
                  np.array([500.0, 320.0, 240.0, -0.01])),
        2: Camera(2, "PINHOLE", 800, 600, np.array([400.0, 410.0, 400.0, 300.0])),
    }
    images = {}
    for i in range(1, n_ims + 1):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        npts = int(rng.integers(0, 6))
        images[i] = ImagePose(
            id=i, qvec=q, tvec=rng.normal(size=3),
            camera_id=1 + (i % 2), name=f"im_{i}.jpg",
            xys=rng.uniform(0, 640, (npts, 2)),
            point3D_ids=rng.integers(-1, n_pts, npts).astype(np.int64),
        )
    points = {}
    for p in range(1, n_pts + 1):
        tlen = int(rng.integers(1, 4))
        points[p] = Point3D(
            id=p, xyz=rng.normal(size=3), rgb=rng.integers(0, 255, 3).astype(np.uint8),
            error=float(rng.uniform()), image_ids=rng.integers(1, n_ims + 1, tlen).astype(np.int32),
            point2D_idxs=rng.integers(0, 5, tlen).astype(np.int32),
        )
    return cams, images, points


def assert_models_equal(a, b):
    cams1, ims1, pts1 = a
    cams2, ims2, pts2 = b
    assert cams1.keys() == cams2.keys()
    for k in cams1:
        assert cams1[k].model == cams2[k].model
        assert (cams1[k].width, cams1[k].height) == (cams2[k].width, cams2[k].height)
        np.testing.assert_allclose(cams1[k].params, cams2[k].params)
    assert ims1.keys() == ims2.keys()
    for k in ims1:
        np.testing.assert_allclose(ims1[k].qvec, ims2[k].qvec)
        np.testing.assert_allclose(ims1[k].tvec, ims2[k].tvec)
        assert ims1[k].name == ims2[k].name
        np.testing.assert_allclose(ims1[k].xys, ims2[k].xys)
        np.testing.assert_array_equal(ims1[k].point3D_ids, ims2[k].point3D_ids)
    assert pts1.keys() == pts2.keys()
    for k in pts1:
        np.testing.assert_allclose(pts1[k].xyz, pts2[k].xyz)
        np.testing.assert_array_equal(pts1[k].image_ids, pts2[k].image_ids)


@pytest.mark.parametrize("ext", [".bin", ".txt"])
def test_model_roundtrip(tmp_path, ext):
    model = synthetic_model()
    write_model(*model, str(tmp_path), ext=ext)
    back = read_model(str(tmp_path), ext=ext)
    assert_models_equal(model, back)


def test_quat_rotmat_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-10)


def test_camera_K():
    cam = Camera(1, "SIMPLE_RADIAL", 640, 480, np.array([500.0, 320, 240, -0.01]))
    np.testing.assert_allclose(
        cam.K, [[500, 0, 320], [0, 500, 240], [0, 0, 1]]
    )
    cam = Camera(1, "PINHOLE", 640, 480, np.array([500.0, 510.0, 320, 240]))
    assert cam.K[1, 1] == 510.0


def test_overlap_scores_vs_bruteforce():
    _, images, _ = synthetic_model(n_ims=6, n_pts=15, seed=7)
    ids = list(images.keys())
    scores, nums = cal_overlap_scores(ids, images)

    # brute force with the reference's intersect1d formulation
    obs = [np.where(images[i].point3D_ids > 0)[0] for i in ids]
    pts = [np.unique(images[i].point3D_ids[images[i].point3D_ids > 0]) for i in ids]
    n = len(ids)
    want = np.eye(n)
    for i in range(n):
        for j in range(i + 1, n):
            denom = max(len(pts[i]), len(pts[j]), 1)
            want[i, j] = len(np.intersect1d(pts[i], pts[j])) / denom
    np.testing.assert_allclose(scores, want, atol=1e-12)


def test_model_multi_ov_pairs(tmp_path):
    model = synthetic_model(n_ims=6, n_pts=8, seed=1)
    write_model(*model, str(tmp_path), ext=".bin")
    d = model_multi_ov_pairs(str(tmp_path), [0.1, 0.3])
    assert set(d.keys()) == {0.1, 0.3}
    for (a, b) in d[0.1]:
        assert a >= b  # (max, min) name ordering
    # cache file written and reloadable
    d2 = model_multi_ov_pairs(str(tmp_path), [0.1, 0.3])
    assert d2[0.1] == d[0.1] or list(map(tuple, d2[0.1])) == list(map(tuple, d[0.1]))


def test_pair_id_packing():
    assert pair_id_to_image_ids(image_ids_to_pair_id(12, 34)) == (12, 34)
    assert image_ids_to_pair_id(34, 12) == image_ids_to_pair_id(12, 34)


def test_colmap_database(tmp_path):
    db_path = str(tmp_path / "test.db")
    conn = sqlite3.connect(db_path)
    conn.execute("CREATE TABLE images (image_id INTEGER, name TEXT, camera_id INTEGER)")
    conn.execute(
        "CREATE TABLE cameras (camera_id INTEGER, model INTEGER, width INTEGER,"
        " height INTEGER, params BLOB, prior_focal_length INTEGER)"
    )
    conn.execute(
        "CREATE TABLE keypoints (image_id INTEGER, rows INTEGER, cols INTEGER, data BLOB)"
    )
    conn.execute(
        "CREATE TABLE matches (pair_id INTEGER, rows INTEGER, cols INTEGER, data BLOB)"
    )
    kp1 = np.random.default_rng(0).uniform(0, 100, (5, 6)).astype(np.float32)
    kp2 = np.random.default_rng(1).uniform(0, 100, (4, 6)).astype(np.float32)
    m = np.array([[0, 1], [2, 3]], np.uint32)
    conn.execute("INSERT INTO images VALUES (1, 'a.jpg', 1)")
    conn.execute("INSERT INTO images VALUES (2, 'b.jpg', 1)")
    conn.execute(
        "INSERT INTO cameras VALUES (1, 2, 640, 480, ?, 0)",
        (np.array([500.0, 320, 240, -0.01]).tobytes(),),
    )
    conn.execute("INSERT INTO keypoints VALUES (1, 5, 6, ?)", (kp1.tobytes(),))
    conn.execute("INSERT INTO keypoints VALUES (2, 4, 6, ?)", (kp2.tobytes(),))
    conn.execute(
        "INSERT INTO matches VALUES (?, 2, 2, ?)",
        (image_ids_to_pair_id(1, 2), m.tobytes()),
    )
    conn.commit()
    conn.close()

    db = ColmapDatabase(db_path)
    ims = db.load_images()
    assert ims[1] == ("a.jpg", 1)
    assert db.load_images(name_based=True)["b.jpg"] == (2, 1)
    cams = db.load_cameras()
    np.testing.assert_allclose(cams[1]["params"], [500, 320, 240, -0.01])
    kps = db.load_keypoints(key_len=6)
    np.testing.assert_allclose(kps[1], kp1)
    matches = db.load_pair_matches([(1, 2)])
    np.testing.assert_array_equal(matches[(1, 2)], m)
    db.close()
