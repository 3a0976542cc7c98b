"""End-to-end training CLI smoke on synthetic data (tiny shapes)."""

import os
from types import SimpleNamespace

import numpy as np
import pytest
from PIL import Image

from patch2pix_tpu.train.cli import main, parse_args, run_dir_tags


def make_synthetic_data(tmp_path, n_pairs=4):
    scene_dir = tmp_path / "data" / "MegaDepth_undistort" / "0001"
    scene_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(3):
        name = f"0001/im{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (96, 144, 3), np.uint8)
        ).save(str(tmp_path / "data" / "MegaDepth_undistort" / name))
        names.append(name)
    K = np.array([[150.0, 0, 72], [0, 150, 48], [0, 0, 1]])
    pairs = []
    for i in range(n_pairs):
        a, b = i % 3, (i + 1) % 3
        pairs.append(
            SimpleNamespace(
                im1=names[a], im2=names[b], K1=K, K2=K,
                R=np.eye(3), t=np.array([0.5, 0.1, 0.02]),
                crop1=None, crop2=None,
            )
        )
    pair_dir = tmp_path / "pairs"
    pair_dir.mkdir()
    np.save(pair_dir / "test_pairs.npy", {"0001": {"ims": names, "pairs": pairs}})
    return str(tmp_path / "data"), str(pair_dir)


def test_run_dir_tags_encoding():
    args = parse_args(
        ["--change_stride", "--lr_decay", "multistep", "0.2", "5",
         "--pretrain", "x.pth"]
    )
    d = run_dir_tags(args)
    assert ".cs" in d and ".pretrain" in d and "lrms0.2-5" in d
    assert "ks2fe0123" in d and "ep50-5cls50-5" in d
    assert "pre400_conv33dim512-512str2-1fc512-256_psz16-16a8" in d


def test_cli_end_to_end(tmp_path):
    data_root, pair_root = make_synthetic_data(tmp_path)
    out_dir = str(tmp_path / "out")
    main([
        "--data_root", data_root,
        "--pair_root", pair_root,
        "--match_npy", "test_pairs.npy",
        "--out_dir", out_dir,
        "--epochs", "2",
        "--batch", "2",
        "--ptmax", "8",
        "--wt", "96", "--ht", "64",
        "--mesh", "1",
        "--no_eval",
        "--steps_per_epoch", "2",
    ])
    run_dir = None
    for root, dirs, files in os.walk(out_dir):
        if "log.txt" in files:
            run_dir = root
    assert run_dir is not None
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(run_dir, "last.meta.json"))
    assert os.path.exists(os.path.join(run_dir, "ep2.meta.json"))
    # resume path: third epoch starts from saved state
    main([
        "--data_root", data_root,
        "--pair_root", pair_root,
        "--match_npy", "test_pairs.npy",
        "--out_dir", out_dir,
        "--epochs", "3",
        "--batch", "2",
        "--ptmax", "8",
        "--wt", "96", "--ht", "64",
        "--mesh", "1",
        "--no_eval",
        "--steps_per_epoch", "1",
        "--resume",
    ])
    import json

    meta = json.load(open(os.path.join(run_dir, "last.meta.json")))
    assert meta["epoch"] == 2
