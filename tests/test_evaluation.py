"""Evaluation layer: measures, pose recovery, HPatches, matcher façade."""

import numpy as np
import pytest
from PIL import Image

from patch2pix_tpu.data.colmap_model import qvec2rotmat, rotmat2qvec
from patch2pix_tpu.evaluation.geometry import (
    abs2relapose,
    matches2relapose_cv,
    pose2fund,
)
from patch2pix_tpu.evaluation.measure import (
    eval_matches_relapose,
    quat_angle_error,
    sampson_distance,
    symmetric_epipolar_distance,
    vec_angle_error,
)


def random_two_view(n=200, seed=0, noise=0.0):
    """Synthetic calibrated two-view scene with known relative pose."""
    rng = np.random.default_rng(seed)
    K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
    # camera 2 pose relative to camera 1
    aa = 0.3 * rng.normal(size=3)
    angle = np.linalg.norm(aa)
    axis = aa / angle
    Kx = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    R = np.eye(3) + np.sin(angle) * Kx + (1 - np.cos(angle)) * Kx @ Kx
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], (n, 3))
    p1 = (pts / pts[:, 2:3]) @ K.T
    pc2 = pts @ R.T + t
    p2 = (pc2 / pc2[:, 2:3]) @ K.T
    p1 = p1[:, :2] + noise * rng.normal(size=(n, 2))
    p2 = p2[:, :2] + noise * rng.normal(size=(n, 2))
    return p1, p2, K, R, t


def test_sampson_zero_on_perfect_matches():
    p1, p2, K, R, t = random_two_view()
    F = pose2fund(K, K, R, t)
    d = sampson_distance(p1, p2, F)
    assert np.max(d) < 1e-8
    d2 = symmetric_epipolar_distance(p1, p2, F)
    assert np.max(d2) < 1e-8


def test_sampson_matches_device_version():
    """Host numpy and device jnp implementations agree."""
    from patch2pix_tpu.ops.geometry import sampson_dist

    p1, p2, K, R, t = random_two_view(noise=2.0)
    F = pose2fund(K, K, R, t)
    host = sampson_distance(p1, p2, F)
    dev = np.asarray(
        sampson_dist(np.concatenate([p1, p2], axis=1), F.astype(np.float64))
    )
    # device path is float32; host is float64
    np.testing.assert_allclose(host, dev, rtol=5e-3, atol=1e-4)


def test_angle_errors():
    assert vec_angle_error(np.array([1.0, 0, 0]), np.array([0, 1.0, 0])) == pytest.approx(90.0)
    assert vec_angle_error(np.array([1.0, 0, 0]), np.array([2.0, 0, 0])) == pytest.approx(0.0, abs=1e-4)
    q = np.array([1.0, 0, 0, 0])
    assert quat_angle_error(q, -q) == pytest.approx(0.0, abs=1e-4)  # sign-invariant
    # 90deg rotation about z
    qz = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    assert quat_angle_error(q, qz) == pytest.approx(90.0, abs=1e-6)


def test_matches2relapose_cv_recovers_pose():
    p1, p2, K, R, t = random_two_view(n=300, noise=0.3, seed=4)
    E, inls, R_est, t_est = matches2relapose_cv(p1, p2, K, K, rthres=1.0)
    assert len(inls) > 100
    rot_err = quat_angle_error(rotmat2qvec(R), rotmat2qvec(R_est))
    t_err = vec_angle_error(t, t_est.reshape(3))
    assert rot_err < 2.0
    assert t_err < 5.0


def test_abs2relapose_consistency():
    rng = np.random.default_rng(2)
    q1, q2 = rng.normal(size=4), rng.normal(size=4)
    q1, q2 = q1 / np.linalg.norm(q1), q2 / np.linalg.norm(q2)
    c1, c2 = rng.normal(size=3), rng.normal(size=3)
    t12, q12 = abs2relapose(c1, c2, q1, q2)
    R1, R2 = qvec2rotmat(q1), qvec2rotmat(q2)
    np.testing.assert_allclose(qvec2rotmat(q12), R2 @ R1.T, atol=1e-10)
    np.testing.assert_allclose(t12, R2 @ (c1 - c2), atol=1e-10)


def test_hpatches_protocol(tmp_path):
    """Synthetic HPatches layout + perfect/imperfect fake matchers."""
    from patch2pix_tpu.evaluation.hpatches import eval_hpatches

    rng = np.random.default_rng(0)
    for seq, H in (("i_fake", np.eye(3)), ("v_fake", np.diag([2.0, 2.0, 1.0]))):
        d = tmp_path / seq
        d.mkdir()
        for k in (1, 2):
            Image.fromarray(
                rng.integers(0, 255, (32, 32, 3), np.uint8)
            ).save(str(d / f"{k}.png"))
        np.savetxt(str(d / "H_1_2"), H)

    def perfect_matcher(p1_path, p2_path):
        pts1 = rng.uniform(0, 30, (50, 2))
        seq = "i_fake" if "i_fake" in p1_path else "v_fake"
        H = np.eye(3) if seq == "i_fake" else np.diag([2.0, 2.0, 1.0])
        ph = np.concatenate([pts1, np.ones((50, 1))], 1) @ H.T
        pts2 = ph[:, :2] / ph[:, 2:3]
        return np.concatenate([pts1, pts2], 1), np.ones(50), None

    res = eval_hpatches(perfect_matcher, str(tmp_path), log=lambda *_: None)
    assert np.allclose(res.mma(), 1.0)

    def bad_matcher(p1_path, p2_path):
        m = rng.uniform(0, 30, (50, 4))
        m[:, 2:] += 100.0  # all off by >=100 px
        return m, np.ones(50), None

    res = eval_hpatches(bad_matcher, str(tmp_path), log=lambda *_: None)
    assert np.allclose(res.mma(thresholds=[1, 3]), 0.0)


@pytest.fixture(scope="module")
def tiny_matcher(tmp_path_factory):
    """Matcher over a randomly initialised tiny Patch2Pix."""
    import jax
    import jax.numpy as jnp

    from patch2pix_tpu.config import ModelConfig
    from patch2pix_tpu.evaluation.matcher import Matcher
    from patch2pix_tpu.models.patch2pix import Patch2Pix

    model = Patch2Pix(config=ModelConfig().resolved())
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    dummy = jnp.zeros((1, 96, 128, 3), jnp.float32)
    variables = model.init(
        {"params": k1, "proposal": k2}, dummy, dummy, ksize=2, ptmax=8,
        train=False,
    )
    return Matcher(model, variables, ksize=2, io_thres=0.25, imsize=128)


def test_matcher_estimate(tmp_path, tiny_matcher):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (240, 320, 3), np.uint8)).save(p)
        paths.append(p)
    matches, scores, coarse = tiny_matcher.estimate_matches(*paths)
    assert matches.shape[1] == 4
    assert matches.shape[0] == scores.shape[0] == coarse.shape[0]
    assert matches.shape[0] > 0
    # matches are in ORIGINAL pixel coordinates
    assert matches[:, 0].max() <= 320 and matches[:, 1].max() <= 240

    refined, rscores, rcoarse = tiny_matcher.refine_matches(
        paths[0], paths[1], matches[:16], io_thres=0.0, max_matches=16
    )
    assert refined.shape == (min(16, len(matches)), 4)


def test_batched_matcher_sharded(tmp_path, tiny_matcher):
    """BatchedMatcher over the 8-device mesh == per-pair Matcher."""
    from patch2pix_tpu.evaluation.batched import BatchedMatcher
    from patch2pix_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"b{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (240, 320, 3), np.uint8)).save(p)
        paths.append(p)
    pairs = [(paths[0], paths[1]), (paths[1], paths[2]), (paths[0], paths[2])]

    bm = BatchedMatcher(
        tiny_matcher.model, tiny_matcher.variables,
        mesh=make_mesh(8), ksize=2, io_thres=0.25, imsize=128,
    )
    out = bm.match_pairs(pairs)
    assert len(out) == 3
    for (m, s, c), (pa, pb) in zip(out, pairs):
        ref_m, ref_s, ref_c = tiny_matcher.estimate_matches(pa, pb)
        np.testing.assert_allclose(m, ref_m, atol=1e-3)
        np.testing.assert_allclose(s, ref_s, atol=1e-4)


def test_batched_matcher_collective_free(tiny_matcher):
    """The compiled pair-sharded matcher moves NO collectives: pairs
    are fully independent (per-image backbone, per-batch conv4d
    shifts, Pallas gated off under SPMD-safe dispatch)."""
    import jax
    import jax.numpy as jnp

    from patch2pix_tpu.evaluation.batched import BatchedMatcher
    from patch2pix_tpu.ops.dispatch import spmd_safe_dispatch
    from patch2pix_tpu.parallel.comm_stats import collective_stats
    from patch2pix_tpu.parallel.mesh import make_mesh

    for m in (2, 8):
        bm = BatchedMatcher(
            tiny_matcher.model, tiny_matcher.variables,
            mesh=make_mesh(m), ksize=2, imsize=128,
        )
        b = jnp.zeros((m, 96, 128, 3), jnp.float32)
        # re-create the inner jit's lowering under the same dispatch
        # gate the wrapped callable uses
        with spmd_safe_dispatch():
            lowered = jax.jit(
                lambda v, a, c: tiny_matcher.model.apply(
                    v, a, c, ksize=2, fine_cap=bm.fine_cap,
                    stack_backbone=False,
                    method=tiny_matcher.model.predict_fine,
                ),
                in_shardings=(
                    jax.sharding.NamedSharding(bm.mesh, jax.sharding.PartitionSpec()),
                    jax.sharding.NamedSharding(bm.mesh, jax.sharding.PartitionSpec("data")),
                    jax.sharding.NamedSharding(bm.mesh, jax.sharding.PartitionSpec("data")),
                ),
            ).lower(tiny_matcher.variables, b, b)
        comm = collective_stats(lowered.compile().as_text())
        assert not comm, f"collectives in sharded matcher at mesh {m}: {comm}"


def test_hpatches_with_batched_matcher(tmp_path, tiny_matcher):
    """Config 3: HPatches pairs run mesh-sharded via BatchedMatcher."""
    from patch2pix_tpu.evaluation.batched import BatchedMatcher
    from patch2pix_tpu.evaluation.hpatches import eval_hpatches
    from patch2pix_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    for seq in ("i_syn", "v_syn"):
        d = tmp_path / seq
        d.mkdir()
        for k in (1, 2, 3):
            Image.fromarray(
                rng.integers(0, 255, (96, 128, 3), np.uint8)
            ).save(str(d / f"{k}.png"))
            if k > 1:
                np.savetxt(str(d / f"H_1_{k}"), np.eye(3))

    bm = BatchedMatcher(
        tiny_matcher.model, tiny_matcher.variables,
        mesh=make_mesh(8), ksize=2, imsize=128,
    )
    res = eval_hpatches(
        None, str(tmp_path), batch_matcher=bm, log=lambda *_: None
    )
    assert len(res.errors["i"]) + len(res.errors["v"]) == 4
    assert res.mma().shape == (10,)


def test_ncnet_only_coarse_matcher(tmp_path):
    """The reference's NCNet-only config: Patch2Pix without regressors."""
    import jax
    import jax.numpy as jnp

    from patch2pix_tpu.config import ModelConfig
    from patch2pix_tpu.evaluation.matcher import Matcher
    from patch2pix_tpu.models.patch2pix import Patch2Pix

    model = Patch2Pix(config=ModelConfig(regressor=None).resolved())
    dummy = jnp.zeros((1, 96, 128, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, dummy, dummy, ksize=2,
        method=model.predict_coarse,
    )
    m = Matcher(
        model, variables, ksize=2, ncn_thres=0.0, imsize=128,
        eval_type="coarse", mutual=True,
    )
    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"nc{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (240, 320, 3), np.uint8)).save(p)
        paths.append(p)
    matches, scores, coarse = m.estimate_matches(*paths)
    assert matches.shape[1] == 4 and len(matches) > 0
    np.testing.assert_array_equal(matches, coarse)  # coarse-only contract


def test_matches2relapose_device_matches_cv2():
    """Device 5-pt RANSAC == cv2 path on the validation contract:
    both recover the GT pose; interchangeably usable in immatch."""
    from patch2pix_tpu.evaluation.geometry import matches2relapose_device

    p1, p2, K, R, t = random_two_view(n=300, noise=0.3, seed=4)
    E, inls, R_est, t_est = matches2relapose_device(p1, p2, K, K, rthres=1.0)
    assert len(inls) > 100
    assert quat_angle_error(rotmat2qvec(R), rotmat2qvec(R_est)) < 2.0
    assert vec_angle_error(t, t_est.reshape(3)) < 5.0

    # agreement with the cv2 cross-check on the same data
    _, inls_cv, R_cv, t_cv = matches2relapose_cv(p1, p2, K, K, rthres=1.0)
    assert quat_angle_error(rotmat2qvec(R_cv), rotmat2qvec(R_est)) < 2.0
    assert vec_angle_error(t_cv.reshape(3), t_est.reshape(3)) < 5.0


def test_eval_matches_relapose_device_backend():
    p1, p2, K, R, t = random_two_view(n=200, noise=0.3, seed=7)
    from patch2pix_tpu.data.colmap_model import rotmat2qvec as r2q

    matches = np.concatenate([p1, p2], axis=1)
    terr, qerr, inls = eval_matches_relapose(
        matches, K, K, r2q(R), t, ransac_thres=1.0, backend="device"
    )
    assert qerr < 2.0 and terr < 5.0 and len(inls) > 80


def test_matches2relapose_degensac_fallback():
    """Without pydegensac the degensac API falls back to cv2 F-RANSAC
    and still recovers the pose (documented approximation)."""
    from patch2pix_tpu.evaluation.geometry import matches2relapose_degensac

    p1, p2, K, R, t = random_two_view(n=300, noise=0.3, seed=9)
    E, inls, R_est, t_est = matches2relapose_degensac(p1, p2, K, K, rthres=1.0)
    assert len(inls) > 80
    assert quat_angle_error(rotmat2qvec(R), rotmat2qvec(R_est)) < 3.0
    assert vec_angle_error(t, t_est.reshape(3)) < 8.0


def test_matcher_cap_stats(tmp_path, tiny_matcher):
    """fine_cap observability: per-pair valid counts and cap-hit
    counters accumulate on the matcher."""
    rng = np.random.default_rng(9)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"cap{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (240, 320, 3), np.uint8)).save(p)
        paths.append(p)
    tiny_matcher.cap_stats = tiny_matcher._fresh_cap_stats()
    tiny_matcher.estimate_matches(paths[0], paths[1])
    tiny_matcher.estimate_matches(paths[1], paths[0])
    s = tiny_matcher.cap_stats
    assert s["pairs"] == 2 and sum(s["valid_hist"]) == 2
    assert s["valid_min"] >= 0 and s["valid_max"] >= s["valid_min"]
    assert s["valid_sum"] >= s["valid_max"]
    # tiny images: far below the 1200 cap
    assert s["cap_hits"] == 0
