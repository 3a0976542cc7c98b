"""Epipolar distance / pose conversion ops vs golden numpy + synthetic GT."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from patch2pix_tpu.ops import sampson_dist, sym_epi_dist, pose2fund, pose2ess, skew
from patch2pix_tpu.ops.geometry import quat2rot, rot2quat, abs2relapose
from tests import golden


def test_sampson_matches_golden(rng):
    matches = (rng.random((50, 4)) * 100).astype(np.float32)
    F = rng.standard_normal((3, 3)).astype(np.float32)
    got = np.asarray(sampson_dist(jnp.asarray(matches), jnp.asarray(F)))
    want = golden.sampson_np(matches.astype(np.float64), F.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_sym_epi_matches_golden(rng):
    matches = (rng.random((50, 4)) * 100).astype(np.float32)
    F = rng.standard_normal((3, 3)).astype(np.float32)
    got = np.asarray(sym_epi_dist(jnp.asarray(matches), jnp.asarray(F)))
    want = golden.sym_epi_np(matches.astype(np.float64), F.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def _synthetic_two_view(rng, n=100):
    """Random 3D points projected into two cameras with known pose."""
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    R = Rotation.from_rotvec([0.05, -0.1, 0.02]).as_matrix()
    t = np.array([0.5, 0.1, -0.05])
    pts = rng.random((n, 3)) * [4, 3, 2] + [-2, -1.5, 4]
    p1 = (K @ pts.T).T
    p1 = p1[:, :2] / p1[:, 2:3]
    pts2 = (R @ pts.T).T + t
    p2 = (K @ pts2.T).T
    p2 = p2[:, :2] / p2[:, 2:3]
    return K, R, t, p1, p2


def test_pose2fund_zero_distance_on_true_matches(rng):
    K, R, t, p1, p2 = _synthetic_two_view(rng)
    F = np.asarray(pose2fund(jnp.asarray(K), jnp.asarray(K), jnp.asarray(R), jnp.asarray(t)))
    matches = np.concatenate([p1, p2], axis=1)
    d = np.asarray(sampson_dist(jnp.asarray(matches), jnp.asarray(F)))
    assert np.max(d) < 1e-3  # perfect correspondences -> ~0 sampson distance


def test_pose2ess_epipolar_constraint(rng):
    K, R, t, p1, p2 = _synthetic_two_view(rng)
    E = np.asarray(pose2ess(jnp.asarray(R), jnp.asarray(t)))
    x1 = np.linalg.inv(K) @ np.concatenate([p1, np.ones((len(p1), 1))], 1).T
    x2 = np.linalg.inv(K) @ np.concatenate([p2, np.ones((len(p2), 1))], 1).T
    resid = np.abs(np.sum(x2 * (E @ x1), axis=0))
    assert np.max(resid) < 1e-8


def test_quat_roundtrip(rng):
    for _ in range(20):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        R = np.asarray(quat2rot(jnp.asarray(q)))
        R_want = Rotation.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
        np.testing.assert_allclose(R, R_want, atol=1e-6)
        q2 = np.asarray(rot2quat(jnp.asarray(R)))
        # q and -q are the same rotation
        assert min(np.linalg.norm(q2 - q), np.linalg.norm(q2 + q)) < 1e-5


def test_abs2relapose(rng):
    q1 = rng.standard_normal(4); q1 /= np.linalg.norm(q1)
    q2 = rng.standard_normal(4); q2 /= np.linalg.norm(q2)
    c1 = rng.standard_normal(3)
    c2 = rng.standard_normal(3)
    t12, q12 = abs2relapose(jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(q1), jnp.asarray(q2))
    r1 = Rotation.from_quat([q1[1], q1[2], q1[3], q1[0]]).as_matrix()
    r2 = Rotation.from_quat([q2[1], q2[2], q2[3], q2[0]]).as_matrix()
    np.testing.assert_allclose(np.asarray(quat2rot(q12)), r2 @ r1.T, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t12), r2 @ (c1 - c2), atol=1e-6)


def test_skew():
    v = jnp.asarray([1.0, 2.0, 3.0])
    S = np.asarray(skew(v))
    a = np.array([0.3, -0.2, 0.9])
    np.testing.assert_allclose(S @ a, np.cross([1, 2, 3], a), atol=1e-6)
