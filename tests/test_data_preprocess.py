"""Preprocessing parity tests against the reference formulas."""

import numpy as np
import pytest
from PIL import Image

from patch2pix_tpu.data.preprocess import (
    cal_rescale_size,
    crop_from_bottom_right,
    imagenet_normalize,
    load_im_flexible,
    load_im_tensor,
    scale_intrinsic,
    to_array,
)


def reference_rescale(image_size, w, h, k_size=2, scale_factor=1 / 16):
    # the reference arithmetic verbatim
    # (/root/reference/utils/datasets/preprocess.py:83-91)
    wt = int(np.floor(w / (max(w, h) / image_size) * scale_factor / k_size) / scale_factor * k_size)
    ht = int(np.floor(h / (max(w, h) / image_size) * scale_factor / k_size) / scale_factor * k_size)
    return wt, ht


@pytest.mark.parametrize(
    "w,h,imsize,ksize,up",
    [
        (1600, 1200, 1024, 2, 16),
        (1024, 768, 1024, 2, 16),
        (640, 480, 1024, 2, 8),
        (999, 501, 512, 1, 16),
        (480, 320, 480, 2, 16),
    ],
)
def test_cal_rescale_size_matches_reference(w, h, imsize, ksize, up):
    got = cal_rescale_size(imsize, w, h, ksize, up)
    want = reference_rescale(imsize, w, h, ksize, 1 / up)
    assert got == want
    assert got[0] % (ksize * up) == 0 and got[1] % (ksize * up) == 0


def test_crop_from_bottom_right():
    # aspect outside [1.3, 1.7] -> rejected
    assert crop_from_bottom_right(1000, 1000) is None
    # already exact
    assert crop_from_bottom_right(1500, 1000) == (0.0, 0.0)
    # wide image: crop width
    dw, dh = crop_from_bottom_right(1600, 1000)
    assert abs((1600 - dw) / (1000 - dh) - 1.5) < 1e-6
    # tall-ish image: crop height
    dw, dh = crop_from_bottom_right(1400, 1000)
    assert abs((1400 - dw) / (1000 - dh) - 1.5) < 1e-6


def test_normalize_and_to_array():
    arr = np.full((4, 4, 3), 0.5, np.float32)
    out = imagenet_normalize(arr)
    assert np.allclose(
        out[0, 0], (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225]),
        atol=1e-6,
    )
    im = Image.fromarray(np.full((4, 4, 3), 128, np.uint8))
    raw = to_array(im, normalize=False)
    assert np.allclose(raw, 128 / 255.0)


def test_load_im_flexible_and_tensor(tmp_path):
    path = str(tmp_path / "im.jpg")
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (300, 400, 3), np.uint8)
    ).save(path)
    arr, scale = load_im_flexible(path, k_size=2, upsample=16, imsize=256)
    h, w, _ = arr.shape
    assert w % 32 == 0 and h % 32 == 0
    assert abs(scale[0] - 400 / w) < 1e-9 and abs(scale[1] - 300 / h) < 1e-9

    rgb, gray, sc = load_im_tensor(path, imsize=200, with_gray=True)
    assert max(rgb.shape[1], rgb.shape[0]) == 200
    assert gray.shape == (*rgb.shape[:2], 1)


def test_scale_intrinsic():
    K = np.array([[100.0, 0, 50], [0, 100, 40], [0, 0, 1]])
    K2 = scale_intrinsic(K, 100, 80, 50, 40)
    assert np.allclose(K2, [[50, 0, 25], [0, 50, 20], [0, 0, 1]])


def test_megadepth_dataset(tmp_path):
    """End-to-end synthetic MegaDepth pair npy -> batches."""
    from types import SimpleNamespace

    from patch2pix_tpu.data.megadepth import MegaDepthPairDataset, batch_iterator

    scene_dir = tmp_path / "MegaDepth_undistort" / "0001"
    scene_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(2):
        name = f"0001/im{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (330, 495, 3), np.uint8)
        ).save(str(tmp_path / "MegaDepth_undistort" / name))
        names.append(name)

    K = np.array([[500.0, 0, 247], [0, 500, 165], [0, 0, 1]])
    pair = SimpleNamespace(
        im1=names[0], im2=names[1], K1=K, K2=K,
        R=np.eye(3), t=np.array([1.0, 0, 0]),
        crop1=(15, 10), crop2=(15, 10),
    )
    npy = tmp_path / "pairs.npy"
    np.save(npy, {"0001": {"ims": names, "pairs": [pair, pair]}})

    ds = MegaDepthPairDataset(str(tmp_path), str(npy), wt=96, ht=64)
    assert len(ds) == 2
    item = ds[0]
    assert item["im1"].shape == (64, 96, 3)
    assert item["F"].shape == (3, 3)
    batches = list(batch_iterator(ds, 2, shuffle=False, num_workers=2))
    assert batches[0]["im1"].shape == (2, 64, 96, 3)
    assert batches[0]["F"].shape == (2, 3, 3)


def test_megadepth_dataset_triplet_and_plotting(tmp_path):
    """Triplet mode adds a cross-scene negative; loader visualisers and
    the cv2/pdf plot helpers render from the produced batches."""
    from types import SimpleNamespace

    from patch2pix_tpu.data.megadepth import MegaDepthPairDataset, batch_iterator
    from patch2pix_tpu.utils.plotting import (
        plot_imlist_to_pdf,
        plot_matches_cv,
        plot_pair_loader,
        plot_triple_loader,
    )

    rng = np.random.default_rng(0)
    scenes = {}
    K = np.array([[500.0, 0, 247], [0, 500, 165], [0, 0, 1]])
    for sc in ("0001", "0002"):
        (tmp_path / "MegaDepth_undistort" / sc).mkdir(parents=True)
        names = []
        for i in range(2):
            name = f"{sc}/im{i}.jpg"
            Image.fromarray(
                rng.integers(0, 255, (330, 495, 3), np.uint8)
            ).save(str(tmp_path / "MegaDepth_undistort" / name))
            names.append(name)
        pair = SimpleNamespace(
            im1=names[0], im2=names[1], K1=K, K2=K,
            R=np.eye(3), t=np.array([1.0, 0, 0]),
        )
        scenes[sc] = {"ims": names, "pairs": [pair]}
    npy = tmp_path / "pairs.npy"
    np.save(npy, scenes)

    ds = MegaDepthPairDataset(str(tmp_path), str(npy), wt=96, ht=64, triplet=True)
    item = ds[0]
    assert item["neg_im"].shape == (64, 96, 3)
    # the negative comes from the OTHER scene deterministically possible
    batches = list(batch_iterator(ds, 2, shuffle=False, num_workers=1))
    assert batches[0]["neg_im"].shape[0] == 2

    fig = plot_pair_loader(batches, row_max=2)
    assert fig is not None
    fig = plot_triple_loader(batches, row_max=2)
    assert fig is not None

    matches = np.array([[10.0, 10, 20, 20], [40, 30, 45, 33]])
    canvas = plot_matches_cv(item["im1"] * 0.2 + 0.45, item["im2"] * 0.2 + 0.45,
                             matches)
    assert canvas.dtype == np.uint8 and canvas.shape[1] == 2 * 96

    pdf = tmp_path / "grids.pdf"
    plot_imlist_to_pdf([[item["im1"] * 0 + 0.5] * 2], str(pdf))
    assert pdf.stat().st_size > 0
