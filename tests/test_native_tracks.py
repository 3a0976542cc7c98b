"""C++ track builder: exact parity with the Python reference + speed."""

import time

import numpy as np
import pytest

from patch2pix_tpu.native import build_tracks_native, native_available
from patch2pix_tpu.sfm.tracks import build_tracks


def canonical(tracks, nd=6):
    return sorted(
        tuple(sorted((im, round(xy[0], nd), round(xy[1], nd)) for im, xy in t.items()))
        for t in tracks
    )


def random_matches(n_ims=8, n_pairs=20, n_matches=200, seed=0):
    rng = np.random.default_rng(seed)
    out = {}
    for _ in range(n_pairs):
        i, j = sorted(rng.choice(n_ims, 2, replace=False))
        if (i, j) in out:
            continue
        out[(int(i), int(j))] = rng.uniform(0, 500, (n_matches, 4))
    return out


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_parity_random():
    pm = random_matches()
    py = build_tracks(pm, cell=4.0, min_track_len=2, use_native=False)
    cc = build_tracks_native(pm, cell=4.0, min_track_len=2)
    assert canonical(py) == canonical(cc)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_parity_structured():
    """Chained matches that must merge into multi-view tracks."""
    rng = np.random.default_rng(1)
    pts = rng.uniform(10, 400, (60, 2))
    pm = {}
    for i in range(4):
        # same physical points seen in consecutive images with jitter<cell
        a = pts + 0.3 * rng.standard_normal(pts.shape)
        b = pts + 0.3 * rng.standard_normal(pts.shape)
        pm[(i, i + 1)] = np.concatenate([a, b], axis=1)
    py = build_tracks(pm, cell=4.0, min_track_len=3, use_native=False)
    cc = build_tracks_native(pm, cell=4.0, min_track_len=3)
    assert canonical(py) == canonical(cc)
    assert len(cc) > 0
    assert max(len(t) for t in cc) >= 3


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_speed():
    pm = random_matches(n_ims=30, n_pairs=120, n_matches=1000, seed=3)
    t0 = time.perf_counter()
    build_tracks(pm, use_native=False)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_tracks_native(pm)
    t_cc = time.perf_counter() - t0
    # native should be at least several times faster on 120k matches
    assert t_cc < t_py
