"""Feature-track building from dense pairwise matches (host side).

Patch2Pix is detector-free — matches are arbitrary sub-pixel
correspondences, not keypoint indices — so multi-view tracks are
formed by quantizing match endpoints to a per-image grid and
union-finding (image, cell) nodes connected by matches. This is the
standard detector-free SfM bridge; no reference counterpart exists
(the reference never builds reconstructions, SURVEY.md §2.8).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np


class UnionFind:
    def __init__(self):
        self.parent: Dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_tracks(
    pair_matches: Dict[Tuple[int, int], np.ndarray],
    cell: float = 4.0,
    min_track_len: int = 2,
    use_native: bool = True,
) -> List[Dict[int, np.ndarray]]:
    """Merge dense pairwise matches into multi-view tracks.

    Args:
      pair_matches: {(i, j): (N, 4) pixel matches x1 y1 x2 y2}
        with i < j image indices.
      cell: quantization cell size in pixels — endpoints of different
        pairs within the same cell are treated as the same feature.
      min_track_len: drop tracks observed in fewer images.

    Returns:
      list of tracks; each track is {image_id: (2,) mean pixel coords}.
      A track that hits an image in two different cells is dropped as
      inconsistent (standard conservative policy).

    The C++ union-find (patch2pix_tpu/native/tracks.cpp) handles
    scene-scale inputs ~100x faster; this Python path is the
    reference implementation and the fallback without a toolchain.
    """
    if use_native:
        from patch2pix_tpu.native import build_tracks_native

        native = build_tracks_native(pair_matches, cell, min_track_len)
        if native is not None:
            return native

    uf = UnionFind()
    obs: Dict[Tuple[int, int, int], List[np.ndarray]] = defaultdict(list)

    def node(im, x, y):
        return (im, int(np.floor(x / cell)), int(np.floor(y / cell)))

    for (i, j), m in pair_matches.items():
        for x1, y1, x2, y2 in np.asarray(m, np.float64):
            n1 = node(i, x1, y1)
            n2 = node(j, x2, y2)
            uf.union(n1, n2)
            obs[n1].append(np.array([x1, y1]))
            obs[n2].append(np.array([x2, y2]))

    groups: Dict = defaultdict(list)
    for n in obs:
        groups[uf.find(n)].append(n)

    tracks = []
    for nodes in groups.values():
        ims = [n[0] for n in nodes]
        if len(set(ims)) < min_track_len:
            continue
        if len(ims) != len(set(ims)):
            continue  # image observed twice -> inconsistent track
        tracks.append(
            {n[0]: np.mean(obs[n], axis=0) for n in nodes}
        )
    return tracks
