"""Visual localization: query pose from matches against a mapped scene.

The reference defers Aachen/InLoc localization to the external
image-matching-toolbox (/root/reference/README.md:28-31); this module
implements the standard hierarchical-localization inner loop natively
on top of this repo's primitives:

  1. match the query against retrieved database images (any
     ``matcher(q_path, db_path)`` callable — Patch2Pix fine matching),
  2. lift each database-image match endpoint to a 3D point through the
     scene reconstruction (a COLMAP model or an
     :class:`patch2pix_tpu.sfm.Reconstruction`) by nearest registered
     2D observation within ``lift_radius`` pixels,
  3. solve the aggregated 2D-3D set with the device PnP RANSAC
     (:func:`patch2pix_tpu.sfm.pnp.ransac_pnp`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from patch2pix_tpu.sfm.pnp import ransac_pnp
from patch2pix_tpu.sfm.twoview import normalize_points


@dataclass
class MapImage:
    """A database image with its registered 2D->3D observations."""

    path: str
    xys: np.ndarray  # (M, 2) registered 2D observations
    pts3d: np.ndarray  # (M, 3) corresponding 3D points


@dataclass
class LocalizationResult:
    R: Optional[np.ndarray]  # world->cam
    t: Optional[np.ndarray]
    num_inliers: int
    num_corrs: int

    @property
    def success(self) -> bool:
        return self.R is not None

    @property
    def camera_center(self) -> Optional[np.ndarray]:
        return None if self.R is None else -self.R.T @ self.t


def map_images_from_colmap(
    model_dir: str, image_dir: str, ext: str = ".bin"
) -> Dict[str, MapImage]:
    """Build MapImage records from a COLMAP sparse model."""
    import os

    from patch2pix_tpu.data.colmap_model import read_model

    cams, images, points = read_model(model_dir, ext=ext)
    out = {}
    for im in images.values():
        sel = im.point3D_ids > 0
        pids = im.point3D_ids[sel]
        keep = np.asarray([p in points for p in pids])
        if keep.size == 0:
            continue
        xys = im.xys[sel][keep]
        p3d = np.stack([points[p].xyz for p in pids[keep]]) if keep.any() else np.zeros((0, 3))
        out[im.name] = MapImage(
            path=os.path.join(image_dir, im.name), xys=xys, pts3d=p3d
        )
    return out


def lift_matches(
    matches: np.ndarray, db: MapImage, lift_radius: float = 4.0
) -> Tuple[np.ndarray, np.ndarray]:
    """(query_xy, 3D point) pairs for matches whose database endpoint
    lies within ``lift_radius`` px of a registered observation."""
    if len(matches) == 0 or len(db.xys) == 0:
        return np.zeros((0, 2)), np.zeros((0, 3))
    d2 = (
        (matches[:, 2:3] - db.xys[None, :, 0]) ** 2
        + (matches[:, 3:4] - db.xys[None, :, 1]) ** 2
    )  # (N, M)
    nn = np.argmin(d2, axis=1)
    ok = d2[np.arange(len(matches)), nn] <= lift_radius**2
    return matches[ok, 0:2], db.pts3d[nn[ok]]


def localize_query(
    matcher: Callable[[str, str], Tuple[np.ndarray, np.ndarray, np.ndarray]],
    query_path: str,
    K_query: np.ndarray,
    retrieved: Sequence[MapImage],
    px_thres: float = 3.0,
    lift_radius: float = 4.0,
    min_corrs: int = 8,
    seed: int = 0,
) -> LocalizationResult:
    """Localize one query against retrieved database images."""
    q2d, p3d = [], []
    for db in retrieved:
        try:
            matches, scores, _ = matcher(query_path, db.path)
        except Exception:
            continue
        q, X = lift_matches(matches, db, lift_radius)
        q2d.append(q)
        p3d.append(X)
    if not q2d:
        return LocalizationResult(None, None, 0, 0)
    q2d = np.concatenate(q2d)
    p3d = np.concatenate(p3d)
    n = len(q2d)
    if n < min_corrs:
        return LocalizationResult(None, None, 0, n)

    pn = normalize_points(
        jnp.asarray(q2d, jnp.float32), jnp.asarray(K_query, jnp.float32)
    )
    f = (K_query[0, 0] + K_query[1, 1]) / 2.0
    res = ransac_pnp(
        jax.random.PRNGKey(seed),
        jnp.asarray(p3d, jnp.float32),
        pn,
        512,
        float((px_thres / f) ** 2),
    )
    n_inl = int(res.num_inliers)
    if n_inl < min_corrs:
        return LocalizationResult(None, None, n_inl, n)
    return LocalizationResult(
        np.asarray(res.R, np.float64), np.asarray(res.t, np.float64), n_inl, n
    )
