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
  * the Schur reduced camera system ``S = U - W V^-1 W^T`` is
    assembled by scatter-adding one 6x6 outer product per PAIR of
    observations of the same point (pair index arrays are built once
    on host), then solved densely — n_cams is small (10^2-10^3) while
    points/observations are huge, which is exactly why Schur wins,
  * Huber robust reweighting; Levenberg-Marquardt damping driven by a
    tiny host loop around one jitted step.

Verified against scipy.optimize.least_squares on synthetic scenes
(tests/test_sfm_ba.py).
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
    weights (0 masks padding). pair_a/pair_b: (Q,) observation-index
    pairs with equal pt_idx (host-precomputed) for Schur assembly,
    SORTED by their (cam_a, cam_b) block so per-block contributions
    segment-sum instead of scatter-adding Q random indices; pair_seg
    maps each pair to its block, seg_ca/seg_cb are the unique block
    coordinates. fixed_cams: (C,) bool — gauge.
    """

    Rs: jax.Array
    ts: jax.Array
    X: jax.Array
    cam_idx: jax.Array
    pt_idx: jax.Array
    uv: jax.Array
    obs_w: jax.Array
    pair_a: jax.Array
    pair_b: jax.Array
    pair_seg: jax.Array
    seg_ca: jax.Array
    seg_cb: jax.Array
    fixed_cams: jax.Array


def build_problem(
    Rs: np.ndarray,
    ts: np.ndarray,
    X: np.ndarray,
    cam_idx: np.ndarray,
    pt_idx: np.ndarray,
    uv: np.ndarray,
    fixed_cams: Optional[np.ndarray] = None,
) -> BAProblem:
    """Host-side setup: sorts observations by point and precomputes the
    Schur pair index arrays (sum_j track_len(j)^2 pairs)."""
    order = np.argsort(pt_idx, kind="stable")
    cam_idx = np.asarray(cam_idx)[order]
    pt_idx = np.asarray(pt_idx)[order]
    uv = np.asarray(uv)[order]

    # pairs of observations sharing a point
    pair_a, pair_b = [], []
    starts = np.searchsorted(pt_idx, np.arange(X.shape[0]))
    ends = np.searchsorted(pt_idx, np.arange(X.shape[0]), side="right")
    for s, e in zip(starts, ends):
        ids = np.arange(s, e)
        if len(ids) == 0:
            continue
        aa, bb = np.meshgrid(ids, ids, indexing="ij")
        pair_a.append(aa.ravel())
        pair_b.append(bb.ravel())
    pair_a = np.concatenate(pair_a) if pair_a else np.zeros(0, np.int64)
    pair_b = np.concatenate(pair_b) if pair_b else np.zeros(0, np.int64)
    pair_a, pair_b, pair_seg, seg_ca, seg_cb = _sort_pairs_by_block(
        pair_a, pair_b, cam_idx, Rs.shape[0]
    )

    C = Rs.shape[0]
    if fixed_cams is None:
        fixed = np.zeros(C, bool)
        fixed[0] = True  # gauge: hold the first camera
    else:
        fixed = np.asarray(fixed_cams, bool)
    return BAProblem(
        Rs=jnp.asarray(Rs, jnp.float32),
        ts=jnp.asarray(ts, jnp.float32),
        X=jnp.asarray(X, jnp.float32),
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pt_idx=jnp.asarray(pt_idx, jnp.int32),
        uv=jnp.asarray(uv, jnp.float32),
        obs_w=jnp.ones(uv.shape[0], jnp.float32),
        pair_a=jnp.asarray(pair_a, jnp.int32),
        pair_b=jnp.asarray(pair_b, jnp.int32),
        pair_seg=jnp.asarray(pair_seg, jnp.int32),
        seg_ca=jnp.asarray(seg_ca, jnp.int32),
        seg_cb=jnp.asarray(seg_cb, jnp.int32),
        fixed_cams=jnp.asarray(fixed, bool),
    )


def _sort_pairs_by_block(pair_a, pair_b, cam_idx, C):
    """Order Schur pairs by their (cam_a, cam_b) block and compute the
    segment mapping (host side, once per problem)."""
    cam_idx = np.asarray(cam_idx)
    if len(pair_a) == 0:
        z = np.zeros(0, np.int64)
        return z, z, z, z.copy(), z.copy()
    key = cam_idx[pair_a] * C + cam_idx[pair_b]
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq, seg = np.unique(key_s, return_inverse=True)
    return (
        pair_a[order], pair_b[order], seg,
        uniq // C, uniq % C,
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
    """Per-observation robust-weighted residuals + analytic Jacobians.

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
    # dproj/dy (M, 2, 3)
    zero = jnp.zeros_like(inv_z)
    dpdy = jnp.stack(
        [
            jnp.stack([inv_z, zero, -y[:, 0] * inv_z**2], -1),
            jnp.stack([zero, inv_z, -y[:, 1] * inv_z**2], -1),
        ],
        -2,
    )
    # dy/d(dw) = -[y]_x ; dy/d(dt) = I
    Jc = jnp.concatenate(
        [-(dpdy @ skew_many(y)), dpdy], axis=-1
    )  # (M, 2, 6)
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
    P = p.X.shape[0]

    r, Jc, Jp, w_obs = residuals_and_jacobians(p)
    w = w_obs * (huber_weights(r, huber_delta) if use_huber else 1.0)
    wJc = Jc * w[:, None, None]
    wJp = Jp * w[:, None, None]

    # Hessian blocks (Gauss-Newton)
    U = jax.ops.segment_sum(
        jnp.einsum("mki,mkj->mij", wJc, Jc), p.cam_idx, num_segments=C
    )  # (C, 6, 6)
    V = jax.ops.segment_sum(
        jnp.einsum("mki,mkj->mij", wJp, Jp), p.pt_idx, num_segments=P
    )  # (P, 3, 3)
    W = jnp.einsum("mki,mkj->mij", wJc, Jp)  # (M, 6, 3)
    bc = -jax.ops.segment_sum(
        jnp.einsum("mki,mk->mi", wJc, r), p.cam_idx, num_segments=C
    )  # (C, 6)
    bp = -jax.ops.segment_sum(
        jnp.einsum("mki,mk->mi", wJp, r), p.pt_idx, num_segments=P
    )  # (P, 3)

    # damp V and invert (3x3 closed form via solve)
    V = V + lm_lambda * jnp.eye(3)[None, :, :] * jnp.maximum(
        jnp.trace(V, axis1=1, axis2=2) / 3.0, 1e-6
    )[:, None, None]
    Vinv = jnp.linalg.inv(V + 1e-9 * jnp.eye(3))

    # Schur assembly: S = U_damped - sum over obs pairs of same point.
    # Pairs arrive pre-sorted by camera block: segment-sum the Q pair
    # contributions into the few unique (ca, cb) blocks, then scatter
    # those — orders faster than Q random-index scatter-adds.
    Y = W @ Vinv[p.pt_idx]  # (M, 6, 3)
    pair_blocks = jnp.einsum(
        "qik,qjk->qij", Y[p.pair_a], W[p.pair_b]
    )  # (Q, 6, 6)
    seg_blocks = jax.ops.segment_sum(
        pair_blocks, p.pair_seg, num_segments=p.seg_ca.shape[0]
    )
    S = jnp.zeros((C, C, 6, 6), jnp.float32)
    S = S.at[p.seg_ca, p.seg_cb].add(-seg_blocks)
    U_damped = U + lm_lambda * jnp.eye(6)[None] * jnp.maximum(
        jnp.trace(U, axis1=1, axis2=2) / 6.0, 1e-6
    )[:, None, None]
    S = S.at[jnp.arange(C), jnp.arange(C)].add(U_damped)

    b_red = bc - jax.ops.segment_sum(
        jnp.einsum("mij,mj->mi", Y, bp[p.pt_idx]), p.cam_idx, num_segments=C
    )  # (C, 6)

    # gauge: project out fixed cameras (identity rows/cols)
    free = (~p.fixed_cams).astype(jnp.float32)
    mask2 = free[:, None] * free[None, :]
    S = S * mask2[:, :, None, None]
    eye_fix = jnp.eye(6)[None] * p.fixed_cams.astype(jnp.float32)[:, None, None]
    S = S.at[jnp.arange(C), jnp.arange(C)].add(eye_fix)
    b_red = b_red * free[:, None]

    Sd = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
    dc = jnp.linalg.solve(Sd, b_red.reshape(-1)).reshape(C, 6)
    dc = dc * free[:, None]

    # back-substitute point updates
    Wt_dc = jax.ops.segment_sum(
        jnp.einsum("mij,mi->mj", W, dc[p.cam_idx]), p.pt_idx, num_segments=P
    )  # (P, 3)
    dp = jnp.einsum("pij,pj->pi", Vinv, bp - Wt_dc)

    # apply local updates
    dR = so3_exp(dc[:, :3])
    new_Rs = dR @ p.Rs
    new_ts = jnp.einsum("cij,cj->ci", dR, p.ts) + dc[:, 3:]
    new_X = p.X + dp
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
