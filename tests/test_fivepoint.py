"""5-point Nister solver + RANSAC: exactness, robustness, cv2 cross-check."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from patch2pix_tpu.sfm.fivepoint import (
    estimate_relative_pose_5pt,
    five_point,
    ransac_essential_5pt,
)
from patch2pix_tpu.sfm.twoview import sampson_epipolar


def synth_scene(rng, n, noise=0.0, outliers=0.0, angle=0.3):
    """Exact normalized correspondences under a random (R, t)."""
    from patch2pix_tpu.data.synthetic import rot_xyz

    R = rot_xyz(*rng.uniform(-angle, angle, 3))
    t = rng.uniform(-1, 1, 3)
    t /= np.linalg.norm(t)
    X = rng.uniform([-1, -1, 3], [1, 1, 8], (n, 3))
    p1 = X[:, :2] / X[:, 2:]
    Xc = X @ R.T + t
    p2 = Xc[:, :2] / Xc[:, 2:]
    if noise:
        p1 = p1 + rng.normal(0, noise, p1.shape)
        p2 = p2 + rng.normal(0, noise, p2.shape)
    n_out = int(outliers * n)
    if n_out:
        p2[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2))
    E = _skew(t) @ R
    return p1.astype(np.float32), p2.astype(np.float32), R, t, E


def _skew(t):
    return np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])


def rot_angle_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def t_angle_deg(ta, tb):
    c = abs(np.dot(ta, tb) / (np.linalg.norm(ta) * np.linalg.norm(tb)))
    return np.degrees(np.arccos(np.clip(c, 0, 1)))


def test_five_point_recovers_exact_essential():
    rng = np.random.default_rng(0)
    hits = 0
    for trial in range(8):
        p1, p2, R, t, E_true = synth_scene(rng, 12)
        Es, valid = jax.jit(five_point)(jnp.asarray(p1[:5]), jnp.asarray(p2[:5]))
        Es, valid = np.asarray(Es), np.asarray(valid)
        assert valid.any(), f"trial {trial}: no real solutions"
        # one solution must reproduce the true E: check epipolar residual
        # on the 7 HELD-OUT correspondences (not used in the solve)
        best = np.inf
        for E, ok in zip(Es, valid):
            if not ok:
                continue
            d = np.asarray(sampson_epipolar(
                jnp.asarray(p1[5:]), jnp.asarray(p2[5:]), jnp.asarray(E)))
            best = min(best, float(np.max(d)))
        if best < 1e-6:
            hits += 1
    # float32 polynomial pipeline: allow an occasional miss
    assert hits >= 6, f"only {hits}/8 exact recoveries"


def test_five_point_solutions_satisfy_constraints():
    rng = np.random.default_rng(3)
    p1, p2, *_ = synth_scene(rng, 5)
    Es, valid = jax.jit(five_point)(jnp.asarray(p1), jnp.asarray(p2))
    Es, valid = np.asarray(Es, np.float64), np.asarray(valid)
    for E, ok in zip(Es, valid):
        if not ok:
            continue
        # det(E) = 0 and the Nister trace constraint, f32-scale tolerance
        assert abs(np.linalg.det(E)) < 5e-4
        resid = 2 * E @ E.T @ E - np.trace(E @ E.T) * E
        assert np.abs(resid).max() < 5e-3
        # the 5 input correspondences lie on the model
        d = np.asarray(sampson_epipolar(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(E, np.float32)))
        assert d.max() < 1e-5


def test_ransac_5pt_with_outliers():
    rng = np.random.default_rng(1)
    p1, p2, R, t, _ = synth_scene(rng, 200, noise=5e-4, outliers=0.3)
    res = ransac_essential_5pt(
        jax.random.PRNGKey(0), jnp.asarray(p1), jnp.asarray(p2),
        256, 1e-5,
    )
    assert int(res.num_inliers) > 100
    assert rot_angle_deg(np.asarray(res.R), R) < 1.0
    assert t_angle_deg(np.asarray(res.t), t) < 2.0


def test_ransac_5pt_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    p1, p2, R, t, _ = synth_scene(rng, 150, noise=1e-3, outliers=0.2)

    E_cv, mask = cv2.findEssentialMat(
        p1, p2, np.eye(3), cv2.FM_RANSAC, 0.999, 1e-2
    )
    _, R_cv, t_cv, _ = cv2.recoverPose(E_cv, p1, p2, np.eye(3), mask=mask)

    res = ransac_essential_5pt(
        jax.random.PRNGKey(1), jnp.asarray(p1), jnp.asarray(p2), 256, 1e-4
    )
    # both must land on the ground truth; device solver no worse than 2x cv2
    err_ours = rot_angle_deg(np.asarray(res.R), R)
    err_cv = rot_angle_deg(R_cv, R)
    assert err_ours < max(1.0, 2 * err_cv), (err_ours, err_cv)
    assert t_angle_deg(np.asarray(res.t), t) < 3.0


def test_estimate_relative_pose_5pt_pixel_frontend():
    rng = np.random.default_rng(4)
    p1, p2, R, t, _ = synth_scene(rng, 120, noise=3e-4)
    f, cx, cy = 600.0, 320.0, 240.0
    K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float32)
    px1 = p1 * f + [cx, cy]
    px2 = p2 * f + [cx, cy]
    matches = jnp.asarray(np.concatenate([px1, px2], axis=1))
    res = estimate_relative_pose_5pt(
        jax.random.PRNGKey(0), matches, jnp.asarray(K), jnp.asarray(K),
        px_thres=1.0,
    )
    assert rot_angle_deg(np.asarray(res.R), R) < 1.0
    assert t_angle_deg(np.asarray(res.t), t) < 2.0
