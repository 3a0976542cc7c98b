"""Schur-complement bundle adjustment, TPU-native.

New capability (no reference counterpart — BASELINE.json north star:
"distributed bundle adjustment via Schur-complement reduction ...
reduced camera system solved over ICI collectives").

Design (single-chip core; the multi-chip wrapper lives in
:mod:`patch2pix_tpu.sfm.dist_ba`):

  * cameras are (R (3,3), t (3,)) with LOCAL updates
    ``y = exp(dw) y0 + dt`` — analytic 2x6 / 2x3 Jacobians, no autodiff
    in the hot path,
  * all Hessian blocks are segment-summed over a flat observation
    array: U_c (6x6 per camera), V_j (3x3 per point), W_i (6x3 per
    observation) — fixed shapes, fully vectorised,
  * the Schur cross term ``W V^-1 W^T`` is ONE dense matmul: with
    ``A_i = W_i L_j`` (L_j = chol(V_j^-1)) scattered into a block
    matrix ``Bt in R^{3P x 6C}``, the whole pairwise sum collapses to
    ``S_cross = Bt^T Bt`` — an MXU contraction over the huge 3P axis,
    no per-pair enumeration (an earlier formulation scattered
    sum_j track_j^2 6x6 outer products; this is ~100x leaner and needs
    no host-side pair indexing at all),
  * Huber robust reweighting; Levenberg-Marquardt damping driven by a
    tiny host loop around one jitted step.

Verified against scipy.optimize.least_squares on synthetic scenes
(tests/test_sfm.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BAProblem(NamedTuple):
    """A fixed-shape bundle-adjustment problem.

    Rs: (C, 3, 3), ts: (C, 3) — world->cam poses.
    X: (P, 3) points. cam_idx/pt_idx: (M,) observation incidence.
    uv: (M, 2) normalized observations. obs_w: (M,) observation
    weights (0 masks padding). fixed_cams: (C,) bool — cameras
    excluded from updates (gauge).
    """

    Rs: jax.Array
    ts: jax.Array
    X: jax.Array
    cam_idx: jax.Array
    pt_idx: jax.Array
    uv: jax.Array
    obs_w: jax.Array
    fixed_cams: jax.Array


def bucket_dim(n: int, base: int = 8) -> int:
    """Static shape bucket: the next value in {base*2^k, 1.5*base*2^k}.

    ``ba_step`` is one large jitted program (Hessian assembly + dense
    reduced solve); without bucketing every (C, P, M) triple of a
    growing incremental reconstruction is a fresh XLA compile — the
    dominant cost of the round-4 50-camera demo (see BASELINE.md
    round 5). Geometric ~1.5x steps cap the pad waste at 50% and the
    compile count at O(log n) per dimension.
    """
    b = base
    while b < n:
        if (b * 3) // 2 >= n:
            return (b * 3) // 2
        b *= 2
    return b


def build_problem(
    Rs: np.ndarray,
    ts: np.ndarray,
    X: np.ndarray,
    cam_idx: np.ndarray,
    pt_idx: np.ndarray,
    uv: np.ndarray,
    fixed_cams: Optional[np.ndarray] = None,
    bucket: bool = False,
) -> BAProblem:
    """Host-side setup (sorts observations by point for locality).

    ``bucket=True`` pads (C, P, M) to static shape buckets so a
    growing reconstruction reuses compiled ``ba_step`` programs:
      * pad cameras are identity poses marked ``fixed_cams`` (the
        gauge path already solves them to a zero update),
      * pad points carry no observations (their damped V solves to a
        zero update),
      * pad observations have ``obs_w = 0`` and reference the last pad
        camera/point, so every Hessian/Schur contribution vanishes.
    """
    order = np.argsort(pt_idx, kind="stable")
    C = Rs.shape[0]
    P = X.shape[0]
    M = len(order)
    if fixed_cams is None:
        fixed = np.zeros(C, bool)
        fixed[0] = True  # gauge: hold the first camera
    else:
        fixed = np.asarray(fixed_cams, bool)
    cam_s = np.asarray(cam_idx)[order]
    pt_s = np.asarray(pt_idx)[order]
    uv_s = np.asarray(uv)[order]
    obs_w = np.ones(M, np.float32)
    if bucket:
        Cb, Pb, Mb = bucket_dim(C), bucket_dim(P, 64), bucket_dim(M, 256)
        Rs = np.concatenate(
            [Rs, np.broadcast_to(np.eye(3), (Cb - C, 3, 3))])
        ts = np.concatenate([ts, np.zeros((Cb - C, 3))])
        fixed = np.concatenate([fixed, np.ones(Cb - C, bool)])
        X = np.concatenate([X, np.zeros((Pb - P, 3))])
        cam_s = np.concatenate(
            [cam_s, np.full(Mb - M, Cb - 1, cam_s.dtype)])
        pt_s = np.concatenate([pt_s, np.full(Mb - M, Pb - 1, pt_s.dtype)])
        uv_s = np.concatenate([uv_s, np.zeros((Mb - M, 2), uv_s.dtype)])
        obs_w = np.concatenate([obs_w, np.zeros(Mb - M, np.float32)])
    return BAProblem(
        Rs=jnp.asarray(Rs, jnp.float32),
        ts=jnp.asarray(ts, jnp.float32),
        X=jnp.asarray(X, jnp.float32),
        cam_idx=jnp.asarray(cam_s, jnp.int32),
        pt_idx=jnp.asarray(pt_s, jnp.int32),
        uv=jnp.asarray(uv_s, jnp.float32),
        obs_w=jnp.asarray(obs_w),
        fixed_cams=jnp.asarray(fixed, bool),
    )


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues: (…, 3) axis-angle -> (…, 3, 3) rotation."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    th = jnp.maximum(theta, 1e-12)
    k = w / th
    K = skew_many(k)
    I = jnp.broadcast_to(jnp.eye(3), K.shape)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    R = I + s * K + (1.0 - c) * (K @ K)
    return jnp.where(theta[..., None] < 1e-9, I, R)


def skew_many(v: jax.Array) -> jax.Array:
    """(…, 3) -> (…, 3, 3) skew-symmetric matrices."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], z, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], z], -1),
        ],
        -2,
    )


def residuals_and_jacobians(p: BAProblem):
    """Per-observation residuals + analytic Jacobians.

    Returns (r (M, 2), Jc (M, 2, 6), Jp (M, 2, 3), w (M,)).
    """
    R = p.Rs[p.cam_idx]  # (M, 3, 3)
    t = p.ts[p.cam_idx]  # (M, 3)
    X = p.X[p.pt_idx]  # (M, 3)
    y = jnp.einsum("mij,mj->mi", R, X) + t  # cam coords
    z = y[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = y[:, :2] / zs[:, None]
    r = proj - p.uv  # (M, 2)

    inv_z = 1.0 / zs
    zero = jnp.zeros_like(inv_z)
    dpdy = jnp.stack(
        [
            jnp.stack([inv_z, zero, -y[:, 0] * inv_z**2], -1),
            jnp.stack([zero, inv_z, -y[:, 1] * inv_z**2], -1),
        ],
        -2,
    )  # (M, 2, 3)
    # dy/d(dw) = -[y]_x ; dy/d(dt) = I
    Jc = jnp.concatenate([-(dpdy @ skew_many(y)), dpdy], axis=-1)  # (M, 2, 6)
    Jp = dpdy @ R  # (M, 2, 3)
    return r, Jc, Jp, p.obs_w


def huber_weights(r: jax.Array, delta: float) -> jax.Array:
    """IRLS weights for the Huber loss on the residual 2-norm."""
    nrm = jnp.linalg.norm(r, axis=-1)
    return jnp.where(nrm <= delta, 1.0, delta / jnp.maximum(nrm, 1e-12))


def cost(p: BAProblem, huber_delta: Optional[float] = None) -> jax.Array:
    """Total (robust) cost = sum of rho(||r||^2) over observations."""
    r, _, _, w = residuals_and_jacobians(p)
    sq = jnp.sum(r**2, axis=-1)
    if huber_delta is None:
        rho = sq
    else:
        nrm = jnp.sqrt(sq)
        d = huber_delta
        rho = jnp.where(sq <= d * d, sq, 2 * d * nrm - d * d)
    return jnp.sum(w * rho)


def schur_blocks(p: BAProblem, lm_lambda, huber_delta, use_huber, C: int):
    """Common Hessian/Schur assembly for the local and distributed
    solvers.

    Returns (S_cross_neg (C,C,6,6) — the cross term, negated, WITHOUT
    the U diagonal; U (C,6,6); b_red (C,6); W (M,6,3); Vinv (P,3,3);
    bp (P,3)).

    The cross term uses the dense-B trick: A_i = W_i chol(Vinv_j)
    scattered into Bt (P, 3, C*6); S_cross = Bt^T Bt over the (P, 3)
    axes — one big MXU matmul, no pair enumeration.
    """
    P_ = p.X.shape[0]
    r, Jc, Jp, w_obs = residuals_and_jacobians(p)
    w = w_obs * (huber_weights(r, huber_delta) if use_huber else 1.0)
    wJc = Jc * w[:, None, None]
    wJp = Jp * w[:, None, None]

    U = jax.ops.segment_sum(
        jnp.einsum("mki,mkj->mij", wJc, Jc), p.cam_idx, num_segments=C
    )  # (C, 6, 6)
    V = jax.ops.segment_sum(
        jnp.einsum("mki,mkj->mij", wJp, Jp), p.pt_idx, num_segments=P_
    )  # (P, 3, 3)
    W = jnp.einsum("mki,mkj->mij", wJc, Jp)  # (M, 6, 3)
    bc = -jax.ops.segment_sum(
        jnp.einsum("mki,mk->mi", wJc, r), p.cam_idx, num_segments=C
    )  # (C, 6)
    bp = -jax.ops.segment_sum(
        jnp.einsum("mki,mk->mi", wJp, r), p.pt_idx, num_segments=P_
    )  # (P, 3)

    V = V + lm_lambda * jnp.eye(3)[None] * jnp.maximum(
        jnp.trace(V, axis1=1, axis2=2) / 3.0, 1e-6
    )[:, None, None]
    Vinv = jnp.linalg.inv(V + 1e-9 * jnp.eye(3))

    # dense-B Schur cross term: Vinv = L L^T, A_i = W_i L
    L = jnp.linalg.cholesky(Vinv + 1e-12 * jnp.eye(3))  # (P, 3, 3)
    A = W @ L[p.pt_idx]  # (M, 6, 3)
    Bt = jnp.zeros((P_, 3, C, 6), jnp.float32)
    Bt = Bt.at[p.pt_idx, :, p.cam_idx, :].add(A.transpose(0, 2, 1))
    Bm = Bt.reshape(P_ * 3, C * 6)
    S_cross = (Bm.T @ Bm).reshape(C, 6, C, 6).transpose(0, 2, 1, 3)

    b_red = bc - jax.ops.segment_sum(
        jnp.einsum("mij,mj->mi", W @ Vinv[p.pt_idx], bp[p.pt_idx]),
        p.cam_idx, num_segments=C,
    )  # (C, 6)
    return -S_cross, U, b_red, W, Vinv, bp


def solve_reduced(S_cross_neg, U, b_red, lm_lambda, fixed_cams):
    """Damp + gauge-fix + densely solve the reduced camera system."""
    C = U.shape[0]
    U_damped = U + lm_lambda * jnp.eye(6)[None] * jnp.maximum(
        jnp.trace(U, axis1=1, axis2=2) / 6.0, 1e-6
    )[:, None, None]
    S = S_cross_neg.at[jnp.arange(C), jnp.arange(C)].add(U_damped)

    free = (~fixed_cams).astype(jnp.float32)
    mask2 = free[:, None] * free[None, :]
    S = S * mask2[:, :, None, None]
    eye_fix = jnp.eye(6)[None] * fixed_cams.astype(jnp.float32)[:, None, None]
    S = S.at[jnp.arange(C), jnp.arange(C)].add(eye_fix)
    b = b_red * free[:, None]

    Sd = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
    dc = jnp.linalg.solve(Sd, b.reshape(-1)).reshape(C, 6)
    return dc * free[:, None]


def backsub_points(p: BAProblem, W, Vinv, bp, dc):
    """Point updates given the camera step."""
    P_ = p.X.shape[0]
    Wt_dc = jax.ops.segment_sum(
        jnp.einsum("mij,mi->mj", W, dc[p.cam_idx]), p.pt_idx,
        num_segments=P_,
    )
    return jnp.einsum("pij,pj->pi", Vinv, bp - Wt_dc)


def apply_updates(Rs, ts, X, dc, dp):
    dR = so3_exp(dc[:, :3])
    return (
        dR @ Rs,
        jnp.einsum("cij,cj->ci", dR, ts) + dc[:, 3:],
        X + dp,
    )


@functools.partial(jax.jit, static_argnums=(3,))
def ba_step(
    p: BAProblem,
    lm_lambda: jax.Array,
    huber_delta: jax.Array,
    use_huber: bool = True,
) -> Tuple[BAProblem, jax.Array, jax.Array]:
    """One damped Gauss-Newton (LM) step via dense-Schur reduction.

    Returns (updated problem, new cost, old cost). The caller accepts
    or rejects the step and adapts ``lm_lambda`` (host-side logic).
    """
    C = p.Rs.shape[0]
    S_cross_neg, U, b_red, W, Vinv, bp = schur_blocks(
        p, lm_lambda, huber_delta, use_huber, C
    )
    dc = solve_reduced(S_cross_neg, U, b_red, lm_lambda, p.fixed_cams)
    dp = backsub_points(p, W, Vinv, bp, dc)
    new_Rs, new_ts, new_X = apply_updates(p.Rs, p.ts, p.X, dc, dp)
    new_p = p._replace(Rs=new_Rs, ts=new_ts, X=new_X)
    hd = huber_delta if use_huber else None
    return new_p, cost(new_p, hd), cost(p, hd)


def run_ba(
    problem: BAProblem,
    max_iters: int = 30,
    init_lambda: float = 1e-3,
    huber_delta: float = float("inf"),
    tol: float = 1e-8,
    verbose: bool = False,
) -> Tuple[BAProblem, float]:
    """Levenberg-Marquardt driver: host damping loop over jitted steps."""
    lam = init_lambda
    use_huber = np.isfinite(huber_delta)
    hd = jnp.float32(huber_delta if use_huber else 1e9)
    cur_cost = float(cost(problem, huber_delta if use_huber else None))
    for it in range(max_iters):
        new_p, new_cost, old_cost = ba_step(
            problem, jnp.float32(lam), hd, use_huber
        )
        new_cost = float(new_cost)
        if new_cost < cur_cost:
            rel = (cur_cost - new_cost) / max(cur_cost, 1e-12)
            problem, cur_cost = new_p, new_cost
            lam = max(lam * 0.5, 1e-9)
            if verbose:
                print(f"  BA it {it}: cost {cur_cost:.6e} lam {lam:.1e}")
            if rel < tol:
                break
        else:
            lam = min(lam * 4.0, 1e6)
            if lam >= 1e6:
                break
    return problem, cur_cost


def reprojection_rmse(p: BAProblem) -> float:
    """Root-mean-square reprojection error (normalized units)."""
    r, _, _, w = residuals_and_jacobians(p)
    sq = jnp.sum(r**2, axis=-1) * w
    return float(jnp.sqrt(jnp.sum(sq) / jnp.maximum(jnp.sum(w), 1.0)))
