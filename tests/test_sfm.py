"""SfM backend: two-view RANSAC, PnP, triangulation, Schur BA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patch2pix_tpu.sfm.ba import (
    BAProblem,
    build_problem,
    cost,
    reprojection_rmse,
    run_ba,
    so3_exp,
)
from patch2pix_tpu.sfm.pnp import ransac_pnp
from patch2pix_tpu.sfm.twoview import (
    decompose_essential,
    eight_point,
    normalize_points,
    ransac_essential,
    triangulate,
)


def rotmat(axis_angle):
    return np.asarray(so3_exp(jnp.asarray(axis_angle, jnp.float32)))


def make_scene(n_cams=6, n_pts=60, noise=0.0, seed=0):
    """Ring of cameras looking at a point cloud near the origin."""
    rng = np.random.default_rng(seed)
    X = rng.uniform([-1, -1, -1], [1, 1, 1], (n_pts, 3))
    Rs, ts = [], []
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams
        c = 4.0 * np.array([np.sin(ang), 0.2 * rng.standard_normal(), np.cos(ang)])
        # look at origin
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])  # world->cam rows
        t = -R @ c
        Rs.append(R)
        ts.append(t)
    Rs, ts = np.stack(Rs), np.stack(ts)

    cam_idx, pt_idx, uv = [], [], []
    for ci in range(n_cams):
        pc = X @ Rs[ci].T + ts[ci]
        proj = pc[:, :2] / pc[:, 2:3]
        for pj in range(n_pts):
            if pc[pj, 2] > 0.5:
                cam_idx.append(ci)
                pt_idx.append(pj)
                uv.append(proj[pj] + noise * rng.standard_normal(2))
    return Rs, ts, X, np.array(cam_idx), np.array(pt_idx), np.array(uv)


def test_eight_point_exact():
    Rs, ts, X, cam_idx, pt_idx, uv = make_scene(n_cams=2, n_pts=40)
    m0 = pt_idx[cam_idx == 0]
    m1 = pt_idx[cam_idx == 1]
    common = np.intersect1d(m0, m1)
    uv0 = {p: uv[i] for i, (c, p) in enumerate(zip(cam_idx, pt_idx)) if c == 0}
    uv1 = {p: uv[i] for i, (c, p) in enumerate(zip(cam_idx, pt_idx)) if c == 1}
    p1 = jnp.asarray([uv0[p] for p in common], jnp.float32)
    p2 = jnp.asarray([uv1[p] for p in common], jnp.float32)
    E = eight_point(p1, p2)
    # epipolar constraint holds
    h1 = jnp.concatenate([p1, jnp.ones((len(common), 1))], 1)
    h2 = jnp.concatenate([p2, jnp.ones((len(common), 1))], 1)
    resid = jnp.abs(jnp.sum((h1 @ E.T) * h2, axis=1))
    assert float(resid.max()) < 1e-4


def test_ransac_essential_with_outliers():
    Rs, ts, X, cam_idx, pt_idx, uv = make_scene(n_cams=2, n_pts=120, noise=1e-4)
    common = np.intersect1d(pt_idx[cam_idx == 0], pt_idx[cam_idx == 1])
    uv0 = {p: uv[i] for i, (c, p) in enumerate(zip(cam_idx, pt_idx)) if c == 0}
    uv1 = {p: uv[i] for i, (c, p) in enumerate(zip(cam_idx, pt_idx)) if c == 1}
    p1 = np.array([uv0[p] for p in common])
    p2 = np.array([uv1[p] for p in common])
    # inject 30% outliers
    rng = np.random.default_rng(1)
    n_out = len(p1) // 3
    p2[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2))

    res = ransac_essential(
        jax.random.PRNGKey(0), jnp.asarray(p1, jnp.float32),
        jnp.asarray(p2, jnp.float32), 512, 1e-5,
    )
    # ground-truth relative pose cam0 -> cam1
    R_gt = Rs[1] @ Rs[0].T
    t_gt = ts[1] - R_gt @ ts[0]
    t_gt = t_gt / np.linalg.norm(t_gt)
    R_est, t_est = np.asarray(res.R), np.asarray(res.t)
    rot_err = np.degrees(
        np.arccos(np.clip((np.trace(R_est.T @ R_gt) - 1) / 2, -1, 1))
    )
    t_err = np.degrees(
        np.arccos(np.clip(abs(t_est @ t_gt), -1, 1))
    )
    assert int(res.num_inliers) > 0.6 * (len(p1) - n_out)
    assert rot_err < 1.0
    assert t_err < 2.0
    # outlier rows mostly rejected
    assert np.asarray(res.inliers)[:n_out].mean() < 0.2


def test_triangulate_exact():
    Rs, ts, X, cam_idx, pt_idx, uv = make_scene(n_cams=2, n_pts=30)
    common = np.intersect1d(pt_idx[cam_idx == 0], pt_idx[cam_idx == 1])
    uv0 = {p: uv[i] for i, (c, p) in enumerate(zip(cam_idx, pt_idx)) if c == 0}
    uv1 = {p: uv[i] for i, (c, p) in enumerate(zip(cam_idx, pt_idx)) if c == 1}
    p1 = jnp.asarray([uv0[p] for p in common], jnp.float32)
    p2 = jnp.asarray([uv1[p] for p in common], jnp.float32)
    Xt = triangulate(
        jnp.asarray(Rs[0], jnp.float32), jnp.asarray(ts[0], jnp.float32),
        jnp.asarray(Rs[1], jnp.float32), jnp.asarray(ts[1], jnp.float32),
        p1, p2,
    )
    np.testing.assert_allclose(np.asarray(Xt), X[common], atol=1e-3)


def test_ransac_pnp():
    Rs, ts, X, cam_idx, pt_idx, uv = make_scene(n_cams=3, n_pts=100, noise=1e-4)
    sel = cam_idx == 2
    Xs = X[pt_idx[sel]]
    p = uv[sel].copy()
    n_out = len(p) // 4
    p[:n_out] = np.random.default_rng(0).uniform(-0.5, 0.5, (n_out, 2))
    res = ransac_pnp(
        jax.random.PRNGKey(1), jnp.asarray(Xs, jnp.float32),
        jnp.asarray(p, jnp.float32), 256, 1e-5,
    )
    R_est, t_est = np.asarray(res.R), np.asarray(res.t)
    rot_err = np.degrees(
        np.arccos(np.clip((np.trace(R_est.T @ Rs[2]) - 1) / 2, -1, 1))
    )
    assert rot_err < 1.0
    np.testing.assert_allclose(t_est, ts[2], atol=0.05)
    assert int(res.num_inliers) > 0.8 * (len(p) - n_out)


def perturb_scene(Rs, ts, X, seed=0, rot=0.02, trans=0.05, pt=0.05):
    rng = np.random.default_rng(seed)
    Rp = np.stack(
        [rotmat(rot * rng.standard_normal(3)) @ R for R in Rs]
    )
    tp = ts + trans * rng.standard_normal(ts.shape)
    Xp = X + pt * rng.standard_normal(X.shape)
    # keep camera 0 exact (gauge)
    Rp[0], tp[0] = Rs[0], ts[0]
    return Rp, tp, Xp


def test_ba_converges_to_noise_floor():
    Rs, ts, X, cam_idx, pt_idx, uv = make_scene(noise=1e-4, seed=2)
    Rp, tp, Xp = perturb_scene(Rs, ts, X, seed=3)
    prob = build_problem(Rp, tp, Xp, cam_idx, pt_idx, uv)
    c0 = float(cost(prob))
    solved, c1 = run_ba(prob, max_iters=25)
    assert c1 < c0 * 1e-3
    # RMSE ~ observation noise (1e-4 per axis)
    assert reprojection_rmse(solved) < 5e-4


def test_ba_matches_scipy():
    from scipy.optimize import least_squares

    Rs, ts, X, cam_idx, pt_idx, uv = make_scene(
        n_cams=4, n_pts=30, noise=1e-3, seed=5
    )
    Rp, tp, Xp = perturb_scene(Rs, ts, X, seed=6, rot=0.01, trans=0.02, pt=0.02)
    prob = build_problem(Rp, tp, Xp, cam_idx, pt_idx, uv)
    solved, c_ours = run_ba(prob, max_iters=40)

    # scipy reference: parameterize cams 1..C-1 as (rotvec, t), points
    from scipy.spatial.transform import Rotation

    C = Rs.shape[0]

    def pack(Rm, tm, Xm):
        rv = Rotation.from_matrix(Rm[1:]).as_rotvec()
        return np.concatenate([rv.ravel(), tm[1:].ravel(), Xm.ravel()])

    def unpack(v):
        nrv = (C - 1) * 3
        rv = v[:nrv].reshape(-1, 3)
        Rm = np.concatenate(
            [Rp[:1], Rotation.from_rotvec(rv).as_matrix()], axis=0
        )
        tm = np.concatenate(
            [tp[:1], v[nrv : 2 * nrv].reshape(-1, 3)], axis=0
        )
        Xm = v[2 * nrv :].reshape(-1, 3)
        return Rm, tm, Xm

    def resid(v):
        Rm, tm, Xm = unpack(v)
        pc = np.einsum("mij,mj->mi", Rm[cam_idx], Xm[pt_idx]) + tm[cam_idx]
        proj = pc[:, :2] / pc[:, 2:3]
        return (proj - uv).ravel()

    sol = least_squares(resid, pack(Rp, tp, Xp), method="lm", max_nfev=2000)
    c_scipy = float(np.sum(sol.fun**2))
    assert c_ours <= c_scipy * 1.2 + 1e-10
