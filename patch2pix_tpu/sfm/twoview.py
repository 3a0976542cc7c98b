"""Device-side two-view geometry: batched solvers + fixed-shape RANSAC.

New capability (no reference counterpart — the reference consumes
COLMAP reconstructions as ground truth only, SURVEY.md §2.8): this is
the front half of the TPU-native SfM backend mandated by BASELINE.json
("two-view geometry from refined matches, triangulation, ...").

TPU design: RANSAC is a FIXED-SHAPE program — H hypothesis index sets
are drawn up front, all minimal solves run as one vmapped batch (small
SVDs batch perfectly on TPU), all hypotheses are scored against all
correspondences with one (H, N) distance matrix, and the best model is
an argmax. No data-dependent loop, one jit, zero host syncs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def normalize_points(pts: jax.Array, K: jax.Array) -> jax.Array:
    """Pixel -> normalized camera coordinates: K^-1 [x y 1]."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    s = K[0, 1]
    y = (pts[..., 1] - cy) / fy
    x = (pts[..., 0] - cx - s * y) / fx
    return jnp.stack([x, y], axis=-1)


def eight_point(p1: jax.Array, p2: jax.Array, w: jax.Array | None = None) -> jax.Array:
    """Essential matrix from >=8 normalized correspondences.

    Linear (Hartley) algorithm: least-squares null vector of the
    epipolar constraint matrix, then projection onto the essential
    manifold (singular values -> (s, s, 0)).

    Args:
      p1, p2: ``(N, 2)`` normalized coords with ``p2^T E p1 = 0``.
      w: optional ``(N,)`` weights (0 masks a row out).

    Returns: ``(3, 3)`` essential matrix.
    """
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    ones = jnp.ones_like(x1)
    # row ordering follows E11..E33 flattening of p2^T E p1
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=1
    )
    if w is not None:
        A = A * w[:, None]
    # null vector via SVD of A (9 columns). full_matrices=True is
    # required: for the minimal 8-row system the null vector is the
    # 9th right-singular vector, which the thin SVD does not return.
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    E = vt[-1].reshape(3, 3)
    # project to essential manifold
    u, s, vt = jnp.linalg.svd(E)
    sm = (s[0] + s[1]) / 2.0
    return (u * jnp.asarray([sm, sm, 0.0])) @ vt


def sampson_epipolar(p1: jax.Array, p2: jax.Array, E: jax.Array) -> jax.Array:
    """Squared Sampson distance in normalized coordinates.

    p1, p2: ``(N, 2)``; E: ``(3, 3)``. Returns ``(N,)``.
    """
    ones = jnp.ones((p1.shape[0], 1), p1.dtype)
    h1 = jnp.concatenate([p1, ones], axis=1)
    h2 = jnp.concatenate([p2, ones], axis=1)
    l2 = h1 @ E.T  # (N, 3)
    l1 = h2 @ E
    dd = jnp.sum(l2 * h2, axis=1)
    denom = l1[:, 0] ** 2 + l1[:, 1] ** 2 + l2[:, 0] ** 2 + l2[:, 1] ** 2
    return dd**2 / (denom + 1e-12)


def triangulate(
    R1: jax.Array, t1: jax.Array, R2: jax.Array, t2: jax.Array,
    p1: jax.Array, p2: jax.Array,
) -> jax.Array:
    """Batched DLT triangulation in normalized coordinates.

    Cameras map world X to cam coords via ``R X + t``. p1, p2 are
    ``(N, 2)`` normalized observations. Returns world points ``(N, 3)``.
    """
    P1 = jnp.concatenate([R1, t1.reshape(3, 1)], axis=1)  # (3, 4)
    P2 = jnp.concatenate([R2, t2.reshape(3, 1)], axis=1)

    def rows(P, p):
        # x * P[2] - P[0], y * P[2] - P[1] for each point: (N, 2, 4)
        return jnp.stack(
            [p[:, 0:1] * P[2] - P[0], p[:, 1:2] * P[2] - P[1]], axis=1
        )

    A = jnp.concatenate([rows(P1, p1), rows(P2, p2)], axis=1)  # (N, 4, 4)
    _, _, vt = jnp.linalg.svd(A)
    X = vt[:, -1]  # (N, 4)
    return X[:, :3] / (X[:, 3:4] + 1e-12 * jnp.sign(X[:, 3:4] + 1e-30))


def decompose_essential(E: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """E -> 4 candidate poses (R_i, t_i), i in [4].

    Returns (Rs (4, 3, 3), ts (4, 3)).
    """
    u, _, vt = jnp.linalg.svd(E)
    # keep rotations proper
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.asarray([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    Ra = u @ W @ vt
    Rb = u @ W.T @ vt
    t = u[:, 2]
    Rs = jnp.stack([Ra, Ra, Rb, Rb])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _chirality_counts(Rs, ts, p1, p2, mask) -> jax.Array:
    """Inlier-weighted count of points in front of both cameras for
    each of the 4 candidate poses."""
    def count(R, t):
        X = triangulate(jnp.eye(3), jnp.zeros(3), R, t, p1, p2)
        z1 = X[:, 2]
        z2 = (X @ R.T + t)[:, 2]
        ok = (z1 > 0) & (z2 > 0) & mask
        return jnp.sum(ok.astype(jnp.int32))

    return jax.vmap(count)(Rs, ts)


def _rodrigues(w: jax.Array) -> jax.Array:
    """so(3) exponential map (stable near 0)."""
    th = jnp.sqrt(jnp.sum(w * w) + 1e-24)
    k = w / th
    Kx = jnp.array(
        [[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]]
    )
    return jnp.eye(3) + jnp.sin(th) * Kx + (1.0 - jnp.cos(th)) * (Kx @ Kx)


def _skew3(t: jax.Array) -> jax.Array:
    return jnp.array(
        [[0.0, -t[2], t[1]], [t[2], 0.0, -t[0]], [-t[1], t[0], 0.0]]
    )


def refine_pose_gn(
    R0: jax.Array, t0: jax.Array, p1: jax.Array, p2: jax.Array,
    weights: jax.Array, iters: int = 5, robust_scale: float | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """IRLS Gauss-Newton refinement of (R, t) on the 5-dof essential
    manifold.

    Minimises the weighted signed Sampson residual over all
    correspondences. The float32 linear 8-point refit is precision-
    limited (the null-vector error scales with the SVD's f32 epsilon
    over a small singular gap and differs across XLA backends); a few
    GN iterations on the true geometric objective push the pose to the
    noise floor of the data instead. t is updated in the tangent basis
    of the unit sphere so scale never drifts.

    ``robust_scale``: optional Cauchy scale (same units as the Sampson
    distance). When set, per-point weights are re-computed every
    iteration as ``1 / (1 + (r/scale)^2)`` on top of ``weights`` —
    pseudo-inliers admitted by a loose RANSAC threshold get smoothly
    down-weighted instead of dragging the pose.
    """
    ones = jnp.ones((p1.shape[0], 1), p1.dtype)
    h1 = jnp.concatenate([p1, ones], axis=1)
    h2 = jnp.concatenate([p2, ones], axis=1)

    # tangent basis of t0 on S^2
    a = jnp.where(jnp.abs(t0[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]),
                  jnp.array([0.0, 1.0, 0.0]))
    b1 = jnp.cross(t0, a)
    b1 = b1 / jnp.linalg.norm(b1)
    b2 = jnp.cross(t0, b1)

    def residual(delta, R, t):
        Rn = _rodrigues(delta[:3]) @ R
        tn = t + delta[3] * b1 + delta[4] * b2
        tn = tn / jnp.sqrt(jnp.sum(tn * tn) + 1e-24)
        E = _skew3(tn) @ Rn
        l2 = h1 @ E.T
        l1 = h2 @ E
        dd = jnp.sum(l2 * h2, axis=1)
        denom = l1[:, 0] ** 2 + l1[:, 1] ** 2 + l2[:, 0] ** 2 + l2[:, 1] ** 2
        return dd / jnp.sqrt(denom + 1e-18)

    def step(_, carry):
        R, t = carry
        z = jnp.zeros((5,), p1.dtype)
        r = residual(z, R, t)
        w = weights
        if robust_scale is not None:
            w = w / (1.0 + (r / robust_scale) ** 2)
        J = jax.jacfwd(residual)(z, R, t)  # (N, 5)
        Jw = J * w[:, None]
        H = Jw.T @ J + 1e-9 * jnp.eye(5)
        delta = -jnp.linalg.solve(H, Jw.T @ r)
        Rn = _rodrigues(delta[:3]) @ R
        tn = t + delta[3] * b1 + delta[4] * b2
        tn = tn / jnp.sqrt(jnp.sum(tn * tn) + 1e-24)
        return Rn, tn

    return jax.lax.fori_loop(0, iters, step, (R0, t0))


class TwoViewResult(NamedTuple):
    E: jax.Array  # (3, 3)
    R: jax.Array  # (3, 3) cam1 -> cam2
    t: jax.Array  # (3,) unit translation
    inliers: jax.Array  # (N,) bool
    num_inliers: jax.Array  # () int32


@functools.partial(jax.jit, static_argnums=(3,))
def ransac_essential(
    key: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    n_hyps: int = 512,
    thres: float = 1e-3,
    valid: jax.Array | None = None,
) -> TwoViewResult:
    """Fixed-shape essential-matrix RANSAC + pose recovery.

    Args:
      key: PRNG key.
      p1, p2: ``(N, 2)`` NORMALIZED correspondences.
      n_hyps: hypothesis count (static).
      thres: squared Sampson threshold in normalized coords
        (~ (px_thres / focal)^2).
      valid: optional ``(N,)`` mask of usable rows.

    Returns :class:`TwoViewResult` with the best pose (chirality-
    disambiguated) and its inlier set. Runs as ONE jitted program.
    """
    n = p1.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    w = valid.astype(p1.dtype)

    # biased-free sampling among valid rows: random keys, sort-trick
    keys = jax.random.split(key, n_hyps)

    def sample_ids(k):
        r = jax.random.uniform(k, (n,))
        return jnp.argsort(jnp.where(valid, r, 2.0))[:8]

    ids = jax.vmap(sample_ids)(keys)  # (H, 8)
    Es = jax.vmap(lambda i: eight_point(p1[i], p2[i]))(ids)  # (H, 3, 3)

    d = jax.vmap(lambda E: sampson_epipolar(p1, p2, E))(Es)  # (H, N)
    inl = (d < thres) & valid[None, :]
    scores = jnp.sum(inl.astype(jnp.int32), axis=1)
    best = jnp.argmax(scores)

    # refit on the best hypothesis' inliers (weighted 8-point)
    best_inl = inl[best]
    E = eight_point(p1, p2, w=best_inl.astype(p1.dtype) * w)
    d_ref = sampson_epipolar(p1, p2, E)
    inliers = (d_ref < thres) & valid

    Rs, ts = decompose_essential(E)
    counts = _chirality_counts(Rs, ts, p1, p2, inliers)
    pick = jnp.argmax(counts)
    return TwoViewResult(
        E=E,
        R=Rs[pick],
        t=ts[pick],
        inliers=inliers,
        num_inliers=jnp.sum(inliers.astype(jnp.int32)),
    )


def estimate_relative_pose(
    key: jax.Array,
    matches: jax.Array,
    K1: jax.Array,
    K2: jax.Array,
    px_thres: float = 1.0,
    n_hyps: int = 512,
    valid: jax.Array | None = None,
) -> TwoViewResult:
    """Pixel-space front end for :func:`ransac_essential`.

    matches ``(N, 4)`` pixel coords; the threshold is converted to
    normalized units with the mean focal length.
    """
    p1 = normalize_points(matches[:, 0:2], K1)
    p2 = normalize_points(matches[:, 2:4], K2)
    f = (K1[0, 0] + K1[1, 1] + K2[0, 0] + K2[1, 1]) / 4.0
    thres = (px_thres / f) ** 2
    return ransac_essential(key, p1, p2, n_hyps, thres, valid)
