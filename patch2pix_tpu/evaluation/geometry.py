"""Host-side (numpy/OpenCV) two-view geometry for evaluation.

Capability parity with /root/reference/utils/eval/geometry.py: the
F/E/pose conversion lambdas :6-20, ``matches2relapose_cv`` :32,
``matches2relapose_degensac`` :53 (gated: pydegensac is optional) and
``abs2relapose`` :73. Device-side jnp equivalents for training losses
live in ``patch2pix_tpu.ops.geometry``; the SfM backend's own RANSAC
lives in ``patch2pix_tpu.sfm``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from patch2pix_tpu.data.colmap_model import qvec2rotmat, rotmat2qvec


def skew(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v).reshape(3)
    return np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], dtype=np.float64
    )


def pose2ess(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    return skew(t) @ R


def ess2fund(K1: np.ndarray, K2: np.ndarray, E: np.ndarray) -> np.ndarray:
    return np.linalg.inv(K2).T @ E @ np.linalg.inv(K1)


def fund2ess(F: np.ndarray, K2: np.ndarray, K1: np.ndarray) -> np.ndarray:
    return K2.T @ F @ K1


def pose2fund(K1: np.ndarray, K2: np.ndarray, R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """F from intrinsics + relative pose; the reference's formulation
    (geometry.py:15): F = K2^-T R K1^T [K1 R^T t]_x."""
    return np.linalg.inv(K2).T @ R @ K1.T @ skew((K1 @ R.T) @ np.asarray(t).reshape(3))


def norm_fund(F: np.ndarray) -> np.ndarray:
    return F / F[-1, -1]


def abs2relapose(
    c1: np.ndarray, c2: np.ndarray, q1: np.ndarray, q2: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Relative (t12, q12) from two absolute camera poses (world->cam
    quaternions + camera centres); reference geometry.py:73-89."""
    r1, r2 = qvec2rotmat(q1), qvec2rotmat(q2)
    r12 = r2 @ r1.T
    t12 = r2 @ (np.asarray(c1) - np.asarray(c2))
    return t12, rotmat2qvec(r12)


def _center_normalize(p1, p2, K1, K2):
    """Shift to principal-point origin and rescale image-1 points to
    image 2's focal length — the reference's preconditioning before
    the 5-pt solver (geometry.py:34-45)."""
    f1, f2 = K1[0, 0], K2[0, 0]
    p1 = (np.asarray(p1, np.float64) - K1[:2, 2]) * (f2 / f1)
    p2 = np.asarray(p2, np.float64) - K2[:2, 2]
    K = np.array([[f2, 0, 0], [0, f2, 0], [0, 0, 1]], dtype=np.float64)
    return p1, p2, K


def matches2relapose_cv(
    p1: np.ndarray,
    p2: np.ndarray,
    K1: np.ndarray,
    K2: np.ndarray,
    rthres: float = 1.0,
):
    """Essential matrix + relative pose via OpenCV 5-pt RANSAC.

    Returns (E, inlier indices, R, t).
    """
    import cv2

    p1n, p2n, K = _center_normalize(p1, p2, K1, K2)
    E, inls = cv2.findEssentialMat(
        p1n, p2n, cameraMatrix=K, method=cv2.FM_RANSAC, threshold=rthres
    )
    inls = np.where(inls.ravel() > 0)[0]
    _, R, t, _ = cv2.recoverPose(E, p1n[inls], p2n[inls], K)
    return E, inls, R, t


def matches2relapose_device(
    p1: np.ndarray,
    p2: np.ndarray,
    K1: np.ndarray,
    K2: np.ndarray,
    rthres: float = 1.0,
    n_samples: int = 256,
    seed: int = 0,
):
    """Device-side 5-pt (Nister) RANSAC relative pose — the TPU-native
    replacement for :func:`matches2relapose_cv` (zero host geometry;
    cv2 stays available as a cross-check). Same preconditioning as the
    reference (geometry.py:34-45): principal-point centring + focal
    rescale of image-1 points, threshold in f2-pixels.

    Match count is padded to power-of-two buckets (validity-masked) so
    the jitted fixed-shape RANSAC compiles once per bucket, not per N.

    Returns (E, inlier indices, R, t) like the cv2 variant.
    """
    import jax
    import jax.numpy as jnp

    from patch2pix_tpu.sfm.fivepoint import ransac_essential_5pt

    p1n, p2n, K = _center_normalize(p1, p2, K1, K2)
    f2 = K[0, 0]
    n = len(p1n)
    bucket = max(64, 1 << int(np.ceil(np.log2(max(n, 1)))))
    pad = bucket - n
    q1 = np.pad(p1n / f2, ((0, pad), (0, 0))).astype(np.float32)
    q2 = np.pad(p2n / f2, ((0, pad), (0, 0))).astype(np.float32)
    valid = np.zeros((bucket,), bool)
    valid[:n] = True

    res = ransac_essential_5pt(
        jax.random.PRNGKey(seed), jnp.asarray(q1), jnp.asarray(q2),
        n_samples, float((rthres / f2) ** 2), jnp.asarray(valid),
    )
    inls = np.where(np.asarray(res.inliers)[:n])[0]
    R = np.asarray(res.R, np.float64)
    t = np.asarray(res.t, np.float64).reshape(3, 1)
    return np.asarray(res.E, np.float64), inls, R, t


def matches2relapose_degensac(
    p1: np.ndarray,
    p2: np.ndarray,
    K1: np.ndarray,
    K2: np.ndarray,
    rthres: float = 1.0,
):
    """DEGENSAC variant (reference geometry.py:53-71).

    Uses pydegensac when installed; otherwise falls back to OpenCV's
    fundamental-matrix RANSAC (``findFundamentalMat`` + ``fund2ess``)
    — the same F-space estimation contract without the plane-degeneracy
    test, documented as an approximation rather than a hard gate.
    """
    import cv2

    p1n, p2n, K = _center_normalize(p1, p2, K1, K2)
    try:
        import pydegensac

        F, inls = pydegensac.findFundamentalMatrix(p1n, p2n, rthres)
    except ImportError:
        F, inls = cv2.findFundamentalMat(
            np.ascontiguousarray(p1n), np.ascontiguousarray(p2n),
            cv2.FM_RANSAC, rthres, 0.999,
        )
    E = fund2ess(F, K, K)
    inls = np.where(np.asarray(inls).ravel() > 0)[0]
    _, R, t, _ = cv2.recoverPose(E, p1n[inls], p2n[inls], K)
    return E, inls, R, t
