"""NVM parsing helpers vs a synthetic reconstruction file."""

import numpy as np
import pytest

from patch2pix_tpu.data.nvm import (
    CambridgeIntrinsics,
    get_positive_pairs,
    parse_3d_points_from_nvm,
    parse_abs_pose_txt,
    parse_nvm_focals,
)


@pytest.fixture
def nvm_file(tmp_path):
    # 3 cameras, 4 points; point measurements reference cameras by index
    lines = [
        "NVM_V3",
        "",
        "3",
        "seq1/frame1.jpg 500.0 1 0 0 0 0 0 0 0 0",
        "seq1/frame2.jpg 510.0 1 0 0 0 1 0 0 0 0",
        "seq1/frame3.jpg 520.0 1 0 0 0 2 0 0 0 0",
        "",
        "4",
        "0.0 1.0 2.0 255 0 0 2 0 0 1.0 1.0 1 1 2.0 2.0",
        "3.0 4.0 5.0 0 255 0 3 0 1 1.0 1.0 1 2 2.0 2.0 2 3 3.0 3.0",
        "6.0 7.0 8.0 0 0 255 1 2 0 1.0 1.0",
        "9.0 10.0 11.0 0 0 0 2 0 2 1.0 1.0 1 3 2.0 2.0",
        "",
    ]
    p = tmp_path / "reconstruction.nvm"
    p.write_text("\n".join(lines))
    return str(p)


def test_parse_3d_points(nvm_file):
    points, cam_points = parse_3d_points_from_nvm(nvm_file)
    assert len(points) == 4
    assert points[1] == ["3.0", "4.0", "5.0"]
    assert cam_points["seq1/frame1.jpg"] == [0, 1, 3]
    assert cam_points["seq1/frame2.jpg"] == [0, 1, 3]
    assert cam_points["seq1/frame3.jpg"] == [1, 2]


def test_parse_focals_and_intrinsics(nvm_file, tmp_path):
    focals = parse_nvm_focals(nvm_file)
    assert focals["seq1/frame2.png"] == 510.0
    # Cambridge intrinsics: focal from nvm, centre pp, resize scaling
    scene_dir = tmp_path / "KingsCollege"
    scene_dir.mkdir()
    (scene_dir / "reconstruction.nvm").write_text(
        open(nvm_file).read()
    )
    intr = CambridgeIntrinsics(str(tmp_path), "KingsCollege", wt=960, ht=540)
    K = intr.get_im_intrinsics("seq1/frame1.png")
    np.testing.assert_allclose(K[0, 0], 500.0 * 0.5)
    np.testing.assert_allclose(K[0, 2], 960 / 2)
    np.testing.assert_allclose(K[1, 2], 540 / 2)


def test_parse_abs_pose_txt(tmp_path):
    p = tmp_path / "poses.txt"
    p.write_text(
        "header\nheader\nheader\n"
        "im1.png 1.0 2.0 3.0 1.0 0.0 0.0 0.0\n"
        "im2.png 4.0 5.0 6.0 0.0 1.0 0.0 0.0\n"
    )
    poses = parse_abs_pose_txt(str(p))
    c, q = poses["im1.png"]
    np.testing.assert_allclose(c, [1, 2, 3])
    np.testing.assert_allclose(q, [1, 0, 0, 0])


def test_get_positive_pairs(nvm_file):
    from types import SimpleNamespace

    _, cam_points = parse_3d_points_from_nvm(nvm_file)
    K = np.eye(3)
    ims = [
        SimpleNamespace(
            name=f"seq1/frame{i + 1}.png", K=K,
            c=np.asarray([float(i), 0.0, 0.0]),
            q=np.asarray([1.0, 0, 0, 0]),
        )
        for i in range(3)
    ]
    pairs = get_positive_pairs(cam_points, ims, thres_min=0.15, thres_max=0.99)
    got = {(p.im1, p.im2): p for p in pairs}
    # frame1/frame2 share all 3 points -> overlap 1.0 > 0.99 (excluded);
    # frame1/frame3: shared {1} -> min(1/3, 1/2) = 1/3 (kept)
    assert ("seq1/frame1.png", "seq1/frame2.png") not in got
    pr = got[("seq1/frame1.png", "seq1/frame3.png")]
    np.testing.assert_allclose(pr.overlap, 1 / 3)
    # identity rotations: relative t = c1 - c2
    np.testing.assert_allclose(pr.t, [-2.0, 0.0, 0.0])
    np.testing.assert_allclose(pr.R, np.eye(3), atol=1e-12)
