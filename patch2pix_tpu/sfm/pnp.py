"""Device-side PnP (camera registration) with fixed-shape RANSAC.

New capability (no reference counterpart): registers a new image
against triangulated 3D points during incremental SfM. Same TPU
design as :mod:`patch2pix_tpu.sfm.twoview`: all hypotheses solved as
one vmapped batch of small SVD problems, scored densely, argmax —
one jitted program, no host syncs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


def dlt_pnp(X: jax.Array, p: jax.Array, w: jax.Array | None = None):
    """Direct linear transform PnP from >=6 points.

    Args:
      X: ``(N, 3)`` world points.
      p: ``(N, 2)`` NORMALIZED image observations.
      w: optional ``(N,)`` row weights.

    Returns:
      (R (3,3), t (3,)) with cam coords = R X + t; the projection
      matrix is orthogonalised (nearest rotation via SVD) and scaled
      so that the camera obeys chirality for the (weighted) majority
      of points.
    """
    n = X.shape[0]
    ones = jnp.ones((n, 1), X.dtype)
    Xh = jnp.concatenate([X, ones], axis=1)  # (N, 4)
    z = jnp.zeros((n, 4), X.dtype)
    # rows: [X 0 -x*X ; 0 X -y*X] for P = [P0; P1; P2]
    r1 = jnp.concatenate([Xh, z, -p[:, 0:1] * Xh], axis=1)
    r2 = jnp.concatenate([z, Xh, -p[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2N, 12)
    if w is not None:
        A = A * jnp.concatenate([w, w])[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    P = vt[-1].reshape(3, 4)
    M = P[:, :3]
    # canonicalise the projective scale INCLUDING its sign with the
    # signed cube root of det(M): P/sigma has a proper-rotation M part
    # and the chirality of the true solution
    det = jnp.linalg.det(M)
    sigma = jnp.sign(det) * jnp.abs(det) ** (1.0 / 3.0)
    sigma = jnp.where(jnp.abs(sigma) < 1e-12, 1e-12, sigma)
    M = M / sigma
    t = P[:, 3] / sigma
    # project M to the nearest rotation
    u, _, vt2 = jnp.linalg.svd(M)
    R = u @ jnp.diag(jnp.asarray([1.0, 1.0, jnp.linalg.det(u @ vt2)])) @ vt2
    return R, t


def reprojection_error_sq(
    X: jax.Array, p: jax.Array, R: jax.Array, t: jax.Array
) -> jax.Array:
    """Squared reprojection error in normalized coords; points behind
    the camera get +inf."""
    pc = X @ R.T + t
    z = pc[:, 2]
    proj = pc[:, :2] / (z[:, None] + 1e-12 * jnp.sign(z[:, None] + 1e-30))
    err = jnp.sum((proj - p) ** 2, axis=1)
    return jnp.where(z > 0, err, jnp.inf)


class PnPResult(NamedTuple):
    R: jax.Array
    t: jax.Array
    inliers: jax.Array
    num_inliers: jax.Array


def _rodrigues(w: jax.Array) -> jax.Array:
    th = jnp.sqrt(jnp.sum(w * w) + 1e-24)
    k = w / th
    Kx = jnp.array(
        [[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]]
    )
    return jnp.eye(3) + jnp.sin(th) * Kx + (1.0 - jnp.cos(th)) * (Kx @ Kx)


def refine_pose_pnp(
    R0: jax.Array, t0: jax.Array, X: jax.Array, p: jax.Array,
    weights: jax.Array, iters: int = 8,
    robust_scale: float | None = None,
) -> tuple:
    """IRLS Gauss-Newton refinement of an SE(3) pose on reprojection
    residuals. The minimal-set DLT hypotheses (and even the weighted
    DLT refit) carry multi-pixel algebraic error at scene scale —
    enough that a tight RANSAC gate finds no inliers at all; a few GN
    iterations on the geometric objective reach the data's noise floor
    (same rationale as twoview.refine_pose_gn)."""

    def residual(delta, R, t):
        Rn = _rodrigues(delta[:3]) @ R
        tn = t + delta[3:]
        pc = X @ Rn.T + tn
        z = jnp.maximum(pc[:, 2], 1e-6)
        return (pc[:, :2] / z[:, None] - p).reshape(-1)  # (2N,)

    def step(_, carry):
        R, t = carry
        z = jnp.zeros((6,), X.dtype)
        r = residual(z, R, t)
        w = jnp.repeat(weights, 2)
        if robust_scale is not None:
            w = w / (1.0 + (r / robust_scale) ** 2)
        J = jax.jacfwd(residual)(z, R, t)  # (2N, 6)
        Jw = J * w[:, None]
        H = Jw.T @ J + 1e-9 * jnp.eye(6)
        delta = -jnp.linalg.solve(H, Jw.T @ r)
        return _rodrigues(delta[:3]) @ R, t + delta[3:]

    return jax.lax.fori_loop(0, iters, step, (R0, t0))


@functools.partial(jax.jit, static_argnums=(3,))
def ransac_pnp(
    key: jax.Array,
    X: jax.Array,
    p: jax.Array,
    n_hyps: int = 256,
    thres: float = 1e-4,
    valid: jax.Array | None = None,
) -> PnPResult:
    """Fixed-shape PnP RANSAC (minimal sets of 6, DLT solver) with
    MSAC scoring and Gauss-Newton polish.

    X ``(N, 3)`` world points, p ``(N, 2)`` normalized observations,
    ``thres`` squared normalized reprojection threshold. Hypotheses
    are scored by the truncated robust cost at a 16x-widened gate
    (hard counting at ``thres`` returns zero inliers for every noisy
    minimal hypothesis once the scene is large), then the winner is
    IRLS-GN refined and the final inlier set gated at ``thres``.
    """
    n = X.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)

    keys = jax.random.split(key, n_hyps)

    def sample_ids(k):
        r = jax.random.uniform(k, (n,))
        return jnp.argsort(jnp.where(valid, r, 2.0))[:6]

    ids = jax.vmap(sample_ids)(keys)
    Rs, ts = jax.vmap(lambda i: dlt_pnp(X[i], p[i]))(ids)
    errs = jax.vmap(lambda R, t: reprojection_error_sq(X, p, R, t))(Rs, ts)
    cap = 16.0 * thres
    msac = jnp.sum(
        jnp.where(valid[None, :], jnp.minimum(errs, cap), 0.0), axis=1
    )
    best = jnp.argmin(msac)

    # coarse-gate inlier weights -> GN polish -> final gate at thres
    w0 = ((errs[best] < cap) & valid).astype(X.dtype)
    R, t = refine_pose_pnp(
        Rs[best], ts[best], X, p, w0,
        robust_scale=jnp.sqrt(thres),
    )
    err = reprojection_error_sq(X, p, R, t)
    inliers = (err < thres) & valid
    return PnPResult(
        R=R, t=t, inliers=inliers,
        num_inliers=jnp.sum(inliers.astype(jnp.int32)),
    )
