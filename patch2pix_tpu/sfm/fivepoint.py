"""Device-side 5-point (Nister) essential-matrix solver + RANSAC.

Replaces the host cv2 path of the reference's validation geometry
(``matches2relapose_cv`` -> ``cv2.findEssentialMat`` 5-pt RANSAC,
/root/reference/utils/eval/geometry.py:32-51) with a fully on-device,
fixed-shape implementation, so the per-epoch immatch validation runs
with ZERO host round-trips in the geometry stage.

TPU-native design decisions (this is not a port of any CPU solver):

  * The 10 cubic constraints (det(E) = 0 and the nine entries of
    ``2 E E^T E - tr(E E^T) E = 0``) are never expanded symbolically.
    Their coefficients over the 20-monomial basis are recovered by
    EVALUATION + INTERPOLATION: evaluate the constraints at 32 fixed
    (x, y, z) nodes (cheap batched 3x3 matrix algebra) and multiply by
    a precomputed float64 pseudo-inverse of the node Vandermonde — one
    constant (20, 32) matmul. No giant scalar expression graphs.
  * The elimination to Nister's 3x3 polynomial system B(z) is a single
    batched 10x10 ``linalg.solve``.
  * deg-10 root finding avoids nonsymmetric eigendecomposition (which
    TPUs don't provide): the polynomial is evaluated in HOMOGENEOUS
    form p(s, c) = sum_k a_k s^k c^(10-k) with (s, c) = (sin, cos)
    over a fixed theta grid — bounded values, no overflow for roots of
    any magnitude — and each sign change is polished by a fixed-depth
    bisection. Up to 10 real-root slots with validity masks; every
    shape is static and the whole solver vmaps over RANSAC samples.

The minimal solve runs in float32; RANSAC re-fits the winning
hypothesis' inliers with the weighted 8-point + manifold projection
(sfm/twoview.py), so per-hypothesis root noise only perturbs inlier
selection, not the final pose.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from patch2pix_tpu.sfm.twoview import (
    TwoViewResult,
    _chirality_counts,
    _skew3 as _skew3j,
    decompose_essential,
    eight_point,
    normalize_points,
    refine_pose_gn,
    sampson_epipolar,
)

# ---------------------------------------------------------------------------
# monomial bookkeeping (host-side constants)
# ---------------------------------------------------------------------------

# Nister's 20-monomial basis, split as 10 leading + 10 trailing. The
# trailing block factors as x*[z^2,z,1], y*[z^2,z,1], [z^3,z^2,z,1],
# which is what makes the B(z) elimination below possible.
_MONOMIALS: Tuple[Tuple[int, int, int], ...] = (
    # leading 10: x^3, y^3, x^2 y, x y^2, x^2 z, x^2, y^2 z, y^2, xyz, xy
    (3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
    (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
    # trailing 10: xz^2, xz, x, yz^2, yz, y, z^3, z^2, z, 1
    (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
    (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
)

_N_NODES = 32


def _interp_constants():
    """(nodes (32, 3), pinv of Vandermonde (20, 32)) in float64->float32.

    Fixed quasi-random evaluation nodes of unit-ish scale; the pinv is
    computed once in float64 so interpolation conditioning never touches
    the device's float32 path.
    """
    rs = np.random.RandomState(1234)
    nodes = rs.uniform(-1.0, 1.0, (_N_NODES, 3))
    V = np.empty((_N_NODES, len(_MONOMIALS)))
    for c, (i, j, k) in enumerate(_MONOMIALS):
        V[:, c] = nodes[:, 0] ** i * nodes[:, 1] ** j * nodes[:, 2] ** k
    pinv = np.linalg.pinv(V)  # (20, 32), cond(V) ~ 1e2 at these nodes
    return jnp.asarray(nodes, jnp.float32), jnp.asarray(pinv, jnp.float32)


_NODES, _VPINV = _interp_constants()


# ---------------------------------------------------------------------------
# minimal solver
# ---------------------------------------------------------------------------


def _nullspace4(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """4-dim null-space basis of the 5x9 epipolar constraint matrix.

    p1, p2: (5, 2) normalized correspondences with p2^T E p1 = 0.
    Returns (4, 3, 3) basis matrices X, Y, Z, W.
    """
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=1
    )  # (5, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[5:].reshape(4, 3, 3)


def _constraint_values(basis: jax.Array) -> jax.Array:
    """Evaluate the 10 cubic constraints at the 32 interpolation nodes.

    basis: (4, 3, 3). Returns (10, 32) constraint values.
    """
    X, Y, Z, W = basis[0], basis[1], basis[2], basis[3]

    def at_node(node):
        E = node[0] * X + node[1] * Y + node[2] * Z + W
        EEt = E @ E.T
        trace = jnp.trace(EEt)
        singular = 2.0 * EEt @ E - trace * E  # (3, 3)
        detE = jnp.linalg.det(E)
        return jnp.concatenate([detE[None], singular.reshape(9)])

    return jax.vmap(at_node, out_axes=1)(_NODES)  # (10, 32)


def _poly_matrix(coeffs: jax.Array) -> jax.Array:
    """Reduce the 10x20 coefficient matrix to Nister's B(z).

    coeffs: (10, 20) over ``_MONOMIALS``. Returns (3, 3, 5): rows are
    the three eliminated equations, columns the (x, y, 1) unknowns,
    last axis polynomial coefficients in z, highest degree first
    (degree <= 4; x/y columns use degree <= 3).
    """
    # Gauss-Jordan on the leading block: leading_mono_i = -B[i, :] . n
    B = jnp.linalg.solve(coeffs[:, :10], coeffs[:, 10:])  # (10, 10)

    # rows by leading monomial (order fixed by _MONOMIALS):
    # 4: x^2 z, 5: x^2, 6: y^2 z, 7: y^2, 8: xyz, 9: xy.
    # For each pair (m*z row rz, m row r): x(a_rz - z a_r) + ... = 0
    def pair(rz, r):
        # trailing cols: a = B[., 0:3] (x z^2, x z, x), b = B[., 3:6],
        # c = B[., 6:10] (z^3, z^2, z, 1); all highest-degree-first
        def shift_sub(top, bot):  # top - z * bot, top/bot high-first
            top = jnp.concatenate([jnp.zeros((1,), top.dtype), top])
            bot = jnp.concatenate([bot, jnp.zeros((1,), bot.dtype)])
            return top - bot

        a = shift_sub(B[rz, 0:3], B[r, 0:3])  # (4,) deg 3
        b = shift_sub(B[rz, 3:6], B[r, 3:6])
        c = shift_sub(B[rz, 6:10], B[r, 6:10])  # (5,) deg 4
        pad = lambda v: jnp.concatenate([jnp.zeros((5 - v.shape[0],), v.dtype), v])
        return jnp.stack([pad(a), pad(b), pad(c)])  # (3, 5)

    return jnp.stack([pair(4, 5), pair(6, 7), pair(8, 9)])  # (3, 3, 5)


def _polymul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full 1-D polynomial product of two coefficient vectors."""
    return jnp.convolve(a, b)


def _det_poly(Bz: jax.Array) -> jax.Array:
    """Degree-10 determinant polynomial of the (3, 3, 5) B(z). (11,)"""
    def m2(r0, r1, c0, c1):  # 2x2 minor -> degree-8 poly (9,)
        return _polymul(Bz[r0, c0], Bz[r1, c1]) - _polymul(Bz[r0, c1], Bz[r1, c0])

    d = (
        _polymul(Bz[0, 0], m2(1, 2, 1, 2))
        - _polymul(Bz[0, 1], m2(1, 2, 0, 2))
        + _polymul(Bz[0, 2], m2(1, 2, 0, 1))
    )  # (13,) but degree <= 10: leading entries are structural zeros
    return d[2:]


_GRID = 256
_BISECT = 40
_THETAS = jnp.linspace(-np.pi / 2 * (1 - 1e-4), np.pi / 2 * (1 - 1e-4), _GRID)


def _eval_homogeneous(coeffs: jax.Array, theta: jax.Array) -> jax.Array:
    """p(tan t) * cos^10 t evaluated stably: sum a_k sin^k cos^(10-k).

    coeffs: (11,) highest-first; theta: (...,). Bounded for all t.
    """
    s, c = jnp.sin(theta), jnp.cos(theta)
    k = jnp.arange(11.0)
    # coeffs[0] is z^10: pairs with sin^10 cos^0
    return jnp.sum(
        coeffs * s[..., None] ** (10.0 - k) * c[..., None] ** k, axis=-1
    )


def _real_roots10(coeffs: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """All real roots of a degree-10 polynomial via grid + bisection.

    coeffs: (11,) highest-first. Returns (roots (10,), valid (10,)).
    Fixed-shape: at most 10 sign-change intervals are kept (a degree-10
    polynomial has at most 10 real roots; extra slots stay invalid).
    """
    v = _eval_homogeneous(coeffs, _THETAS)  # (G,)
    sign_change = v[:-1] * v[1:] < 0.0  # (G-1,)
    # take up to 10 interval indices (top_k on the boolean mask keeps
    # fixed shape; invalid slots point at non-changing intervals)
    score = sign_change.astype(jnp.float32)
    vals, idx = jax.lax.top_k(score, 10)
    valid = vals > 0.5
    lo = _THETAS[idx]
    hi = _THETAS[idx + 1]
    flo = _eval_homogeneous(coeffs, lo)

    def body(_, carry):
        lo, hi, flo = carry
        mid = 0.5 * (lo + hi)
        fmid = _eval_homogeneous(coeffs, mid)
        go_left = flo * fmid < 0.0
        return (
            jnp.where(go_left, lo, mid),
            jnp.where(go_left, mid, hi),
            jnp.where(go_left, flo, fmid),
        )

    lo, hi, _ = jax.lax.fori_loop(0, _BISECT, body, (lo, hi, flo))
    return jnp.tan(0.5 * (lo + hi)), valid


def _constraint_residual(xyz: jax.Array, basis: jax.Array) -> jax.Array:
    """The 10 exact cubic constraints at (x, y, z). (10,)"""
    E = xyz[0] * basis[0] + xyz[1] * basis[1] + xyz[2] * basis[2] + basis[3]
    EEt = E @ E.T
    singular = 2.0 * EEt @ E - jnp.trace(EEt) * E
    return jnp.concatenate([jnp.linalg.det(E)[None], singular.reshape(9)])


def _polish_xyz(xyz: jax.Array, basis: jax.Array, iters: int = 3) -> jax.Array:
    """Damped Gauss-Newton on the exact constraints.

    The polynomial pipeline runs in float32, so raw roots carry ~1e-3
    relative error; 3 GN steps against the EXACT residuals (autodiff
    Jacobian, 3x3 normal equations) restore machine-precision solutions
    without any symbolic algebra.
    """
    def step(_, v):
        r = _constraint_residual(v, basis)
        J = jax.jacfwd(_constraint_residual)(v, basis)  # (10, 3)
        JtJ = J.T @ J + 1e-8 * jnp.eye(3)
        return v - jnp.linalg.solve(JtJ, J.T @ r)

    return jax.lax.fori_loop(0, iters, step, xyz)


def five_point(p1: jax.Array, p2: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Nister 5-point: up to 10 essential matrices for 5 correspondences.

    Args:
      p1, p2: (5, 2) normalized correspondences.

    Returns:
      (Es (10, 3, 3), valid (10,)) — invalid slots are identity-filled.
    """
    basis = _nullspace4(p1, p2)
    vals = _constraint_values(basis)  # (10, 32)
    coeffs = vals @ _VPINV.T  # (10, 20)
    Bz = _poly_matrix(coeffs)
    dpoly = _det_poly(Bz)
    zs, valid = _real_roots10(dpoly)  # (10,), (10,)

    pows = zs[:, None] ** jnp.asarray([4.0, 3.0, 2.0, 1.0, 0.0])  # (10, 5)
    Bn = jnp.einsum("rcd,kd->krc", Bz, pows)  # (10, 3, 3) numeric B(z)

    # null vector of each B(z): cross products of row pairs, pick the
    # best-scaled one, then (x, y) = (v0, v2) / v2... v = (x, y, 1) up
    # to scale so x = v[0]/v[2], y = v[1]/v[2]
    c01 = jnp.cross(Bn[:, 0], Bn[:, 1])
    c02 = jnp.cross(Bn[:, 0], Bn[:, 2])
    c12 = jnp.cross(Bn[:, 1], Bn[:, 2])
    cand = jnp.stack([c01, c02, c12], axis=1)  # (10, 3, 3)
    pick = jnp.argmax(jnp.abs(cand[..., 2]), axis=1)  # (10,)
    v = jnp.take_along_axis(cand, pick[:, None, None], axis=1)[:, 0]  # (10, 3)
    denom = v[:, 2]
    valid = valid & (jnp.abs(denom) > 1e-12)
    safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    x = v[:, 0] / safe
    y = v[:, 1] / safe

    xyz = jnp.stack([x, y, zs], axis=1)  # (10, 3)
    xyz = jax.vmap(_polish_xyz, in_axes=(0, None))(xyz, basis)
    x, y, zs = xyz[:, 0], xyz[:, 1], xyz[:, 2]

    Es = (
        x[:, None, None] * basis[0]
        + y[:, None, None] * basis[1]
        + zs[:, None, None] * basis[2]
        + basis[3]
    )
    norm = jnp.linalg.norm(Es.reshape(10, 9), axis=1)
    Es = Es / jnp.maximum(norm, 1e-12)[:, None, None]
    Es = jnp.where(valid[:, None, None], Es, jnp.eye(3))
    return Es, valid


# ---------------------------------------------------------------------------
# RANSAC
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(3,))
def ransac_essential_5pt(
    key: jax.Array,
    p1: jax.Array,
    p2: jax.Array,
    n_samples: int = 256,
    thres: float = 1e-3,
    valid: jax.Array | None = None,
) -> TwoViewResult:
    """Fixed-shape 5-point RANSAC + pose recovery (one jitted program).

    Mirrors :func:`patch2pix_tpu.sfm.twoview.ransac_essential` but draws
    5-point minimal samples and scores ALL (n_samples x 10) candidate
    essential matrices; the winner's inliers are re-fit with the
    weighted 8-point manifold projection.
    """
    n = p1.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    w = valid.astype(p1.dtype)

    keys = jax.random.split(key, n_samples)

    def sample_ids(k):
        r = jax.random.uniform(k, (n,))
        return jnp.argsort(jnp.where(valid, r, 2.0))[:5]

    ids = jax.vmap(sample_ids)(keys)  # (S, 5)
    Es, ev = jax.vmap(lambda i: five_point(p1[i], p2[i]))(ids)
    Es = Es.reshape(n_samples * 10, 3, 3)
    ev = ev.reshape(n_samples * 10)

    d = jax.vmap(lambda E: sampson_epipolar(p1, p2, E))(Es)  # (S*10, N)
    inl = (d < thres) & valid[None, :]
    scores = jnp.where(ev, jnp.sum(inl.astype(jnp.int32), axis=1), -1)
    best = jnp.argmax(scores)

    # iterated refit: weighted 8-point on the inlier set, re-selecting
    # inliers each round (a device-side local optimization, standing in
    # for cv2's internal refinement); keep the better of the raw
    # hypothesis and the refit by final inlier count
    def refit(_, carry):
        _, inl_cur = carry
        E = eight_point(p1, p2, w=inl_cur.astype(p1.dtype) * w)
        d_ref = sampson_epipolar(p1, p2, E)
        return E, (d_ref < thres) & valid

    E_fit, inl_fit = jax.lax.fori_loop(0, 3, refit, (Es[best], inl[best]))
    use_fit = jnp.sum(inl_fit.astype(jnp.int32)) >= scores[best]
    E = jnp.where(use_fit, E_fit, Es[best])
    inliers = jnp.where(use_fit, inl_fit, inl[best])

    Rs, ts = decompose_essential(E)
    counts = _chirality_counts(Rs, ts, p1, p2, inliers)
    pick = jnp.argmax(counts)

    # geometric polish: two outer rounds of (IRLS GN on the signed
    # Sampson residual -> inlier re-selection). The f32 linear refit
    # alone is backend-noise limited, and one GN round from the
    # decomposed 8-point pose can stall short of the basin the
    # re-selected inlier set supports.
    R_fin, t_fin = Rs[pick], ts[pick]
    for _ in range(2):
        R_fin, t_fin = refine_pose_gn(
            R_fin, t_fin, p1, p2, inliers.astype(p1.dtype) * w,
            robust_scale=0.5 * thres ** 0.5,
        )
        d_fin = sampson_epipolar(p1, p2, _skew3j(t_fin) @ R_fin)
        inliers = (d_fin < thres) & valid
    E_fin = _skew3j(t_fin) @ R_fin
    return TwoViewResult(
        E=E_fin,
        R=R_fin,
        t=t_fin,
        inliers=inliers,
        num_inliers=jnp.sum(inliers.astype(jnp.int32)),
    )


def estimate_relative_pose_5pt(
    key: jax.Array,
    matches: jax.Array,
    K1: jax.Array,
    K2: jax.Array,
    px_thres: float = 0.5,
    n_samples: int = 256,
    valid: jax.Array | None = None,
) -> TwoViewResult:
    """Pixel-space front end (the reference's ``matches2relapose_cv``
    contract, /root/reference/utils/eval/geometry.py:32-51, with the
    same focal-normalized threshold convention)."""
    p1 = normalize_points(matches[:, 0:2], K1)
    p2 = normalize_points(matches[:, 2:4], K2)
    f = (K1[0, 0] + K1[1, 1] + K2[0, 0] + K2[1, 1]) / 4.0
    thres = (px_thres / f) ** 2
    return ransac_essential_5pt(key, p1, p2, n_samples, thres, valid)
