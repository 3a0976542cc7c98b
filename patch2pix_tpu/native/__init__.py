"""Native (C++) runtime components, loaded via ctypes.

The TPU computes matches; the host runtime around it merges and books
them. The hot host paths live here, compiled lazily with g++ on first
use and cached next to the source. Everything has a pure-Python
fallback, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
from typing import Dict, List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None:
        return _LIB
    if _LIB_FAILED or os.environ.get("P2P_DISABLE_NATIVE"):
        return None
    src = os.path.join(_HERE, "tracks.cpp")
    lib_path = os.path.join(_HERE, "_tracks.so")
    try:
        if (
            not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src)
        ):
            subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    src, "-o", lib_path,
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(lib_path)
        lib.p2p_build_tracks.restype = ctypes.c_int64
        lib.p2p_build_tracks.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ]
        lib.p2p_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib
    except Exception:
        _LIB_FAILED = True
        return None


def native_available() -> bool:
    return _build_and_load() is not None


def build_tracks_native(
    pair_matches: Dict[Tuple[int, int], np.ndarray],
    cell: float = 4.0,
    min_track_len: int = 2,
) -> Optional[List[Dict[int, np.ndarray]]]:
    """C++ union-find track builder; None if the native lib is
    unavailable. Output contract matches
    :func:`patch2pix_tpu.sfm.tracks.build_tracks`."""
    lib = _build_and_load()
    if lib is None:
        return None

    ims1, ims2, rows = [], [], []
    for (i, j), m in pair_matches.items():
        m = np.asarray(m, np.float64)
        if m.size == 0:
            continue
        ims1.append(np.full(len(m), i, np.int32))
        ims2.append(np.full(len(m), j, np.int32))
        rows.append(m)
    if not rows:
        return []
    im1 = np.ascontiguousarray(np.concatenate(ims1))
    im2 = np.ascontiguousarray(np.concatenate(ims2))
    m = np.ascontiguousarray(np.concatenate(rows))

    t_ptr = ctypes.POINTER(ctypes.c_int64)()
    im_ptr = ctypes.POINTER(ctypes.c_int32)()
    xy_ptr = ctypes.POINTER(ctypes.c_double)()
    n = lib.p2p_build_tracks(
        im1.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        im2.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(m),
        float(cell),
        int(min_track_len),
        ctypes.byref(t_ptr),
        ctypes.byref(im_ptr),
        ctypes.byref(xy_ptr),
    )
    if n < 0:
        raise MemoryError("p2p_build_tracks allocation failed")
    try:
        tids = np.ctypeslib.as_array(t_ptr, shape=(n,)).copy() if n else np.zeros(0, np.int64)
        ims = np.ctypeslib.as_array(im_ptr, shape=(n,)).copy() if n else np.zeros(0, np.int32)
        xys = np.ctypeslib.as_array(xy_ptr, shape=(2 * n,)).copy().reshape(-1, 2) if n else np.zeros((0, 2))
    finally:
        if n:
            lib.p2p_free(t_ptr)
            lib.p2p_free(im_ptr)
            lib.p2p_free(xy_ptr)

    n_tracks = int(tids.max()) + 1 if n else 0
    tracks: List[Dict[int, np.ndarray]] = [dict() for _ in range(n_tracks)]
    for t, im, xy in zip(tids, ims, xys):
        tracks[t][int(im)] = xy
    return tracks
