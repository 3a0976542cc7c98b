"""Bundle-adjustment benchmark at scale (verdict round-5 item 7).

Times the Schur LM iteration single-chip at several (C, P, M) scales —
including >= 500 cameras / >= 100k points, where the reduced camera
system is 9 M f32 and the O((6C)^2)-independent-of-points psum claim
starts to matter — and (optionally) runs the 8-way point-sharded
distributed solver on a fake CPU mesh recording the compiled psum
volume.

In-jit marginal timing (a fori_loop of fixed-lambda LM steps; the
relay's block_until_ready is optimistic, see .claude/skills/verify).

Usage:
  python tools/bench_ba.py                      # single-chip TPU table
  python tools/bench_ba.py --dist --mesh 8      # + CPU-mesh dist solve
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_scene(n_cams: int, n_pts: int, obs_per_pt: int, seed: int = 0):
    """Ring of cameras around a point cloud; each point observed by its
    ``obs_per_pt`` nearest cameras. Returns BA arrays in normalized
    camera coordinates with 0.5 px-equivalent noise (f=1000)."""
    rng = np.random.default_rng(seed)
    R0 = 10.0
    ang = 2 * np.pi * np.arange(n_cams) / n_cams
    centers = np.stack(
        [R0 * np.cos(ang), 0.3 * rng.standard_normal(n_cams),
         R0 * np.sin(ang)], axis=1)
    Rs = np.zeros((n_cams, 3, 3))
    ts = np.zeros((n_cams, 3))
    for c in range(n_cams):
        fwd = -centers[c] / np.linalg.norm(centers[c])
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upc = np.cross(fwd, right)
        Rs[c] = np.stack([right, upc, fwd])
        ts[c] = -Rs[c] @ centers[c]
    X = rng.uniform([-3, -3, -3], [3, 3, 3], (n_pts, 3))

    # nearest cameras per point (by angle)
    pt_ang = np.arctan2(X[:, 2], X[:, 0])
    cam_of = np.argsort(
        np.abs(((pt_ang[:, None] - ang[None, :]) + np.pi) % (2 * np.pi)
               - np.pi), axis=1)[:, :obs_per_pt]
    pt_idx = np.repeat(np.arange(n_pts), obs_per_pt)
    cam_idx = cam_of.reshape(-1)
    pc = np.einsum("mij,mj->mi", Rs[cam_idx], X[pt_idx]) + ts[cam_idx]
    uv = pc[:, :2] / pc[:, 2:3]
    uv = uv + rng.standard_normal(uv.shape) * (0.5 / 1000.0)
    keep = pc[:, 2] > 0.5
    return Rs, ts, X, cam_idx[keep], pt_idx[keep], uv[keep]


def bench_single(jax, jnp, Rs, ts, X, cam_idx, pt_idx, uv, iters_hi=6):
    from patch2pix_tpu.sfm.ba import (
        backsub_points,
        apply_updates,
        build_problem,
        schur_blocks,
        solve_reduced,
    )

    prob = build_problem(Rs, ts, X, cam_idx, pt_idx, uv)
    C = prob.Rs.shape[0]

    @functools.partial(jax.jit, static_argnums=(1,))
    def lm_iters(p, k):
        def body(i, carry):
            Rs, ts, X = carry
            pp = p._replace(Rs=Rs, ts=ts, X=X)
            S, U, b, W, Vinv, bp = schur_blocks(
                pp, jnp.float32(1e-3), jnp.float32(1e9), False, C
            )
            dc = solve_reduced(S, U, b, jnp.float32(1e-3), p.fixed_cams)
            dp = backsub_points(pp, W, Vinv, bp, dc)
            return apply_updates(Rs, ts, X, dc, dp)

        Rs, ts, X = jax.lax.fori_loop(
            0, k, body, (p.Rs, p.ts, p.X))
        return jnp.sum(X) + jnp.sum(Rs) + jnp.sum(ts)

    def timed(k):
        float(lm_iters(prob, k))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(lm_iters(prob, k))
            best = min(best, time.perf_counter() - t0)
        return best

    lo = 2
    return (timed(iters_hi) - timed(lo)) / (iters_hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dist", action="store_true")
    ap.add_argument("--mesh", type=int, default=8)
    ap.add_argument("--dist_scale", default="500,100000,6")
    ap.add_argument(
        "--scales", default="200,20000,9;500,100000,6;1000,200000,5")
    args = ap.parse_args()

    if args.dist:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.mesh}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax
    import jax.numpy as jnp

    results = []
    if not args.dist:
        for spec in args.scales.split(";"):
            c, p, o = (int(v) for v in spec.split(","))
            Rs, ts, X, ci, pi, uv = make_scene(c, p, o)
            Xn = X + 0.05 * np.random.default_rng(1).standard_normal(X.shape)
            dt = bench_single(jax, jnp, Rs, ts, Xn, ci, pi, uv)
            m = len(ci)
            red_mb = (6 * c) ** 2 * 4 / 1e6
            r = dict(cams=c, pts=p, obs=m,
                     ms_per_lm_iter=round(dt * 1e3, 1),
                     obs_per_s=round(m / dt),
                     reduced_system_mb=round(red_mb, 1))
            results.append(r)
            print(json.dumps(r))
    else:
        from jax.sharding import Mesh

        from patch2pix_tpu.parallel.comm_stats import collective_stats
        from patch2pix_tpu.sfm.dist_ba import (
            make_dist_ba_solver,
            run_dist_ba,
            shard_problem,
        )

        c, p, o = (int(v) for v in args.dist_scale.split(","))
        Rs, ts, X, ci, pi, uv = make_scene(c, p, o)
        Xn = X + 0.05 * np.random.default_rng(1).standard_normal(X.shape)
        sp = shard_problem(Rs, ts, Xn, ci, pi, uv, n_shards=args.mesh)
        mesh = Mesh(np.asarray(jax.devices()[: args.mesh]), ("ba",))
        # comm volume from the compiled HLO of a 2-iteration solve
        solver = make_dist_ba_solver(mesh, c, False, 2, 1e-8)
        operands = (
            jnp.asarray(sp.Rs), jnp.asarray(sp.ts), jnp.asarray(sp.X),
            jnp.asarray(sp.cam_idx, jnp.int32),
            jnp.asarray(sp.pt_idx, jnp.int32),
            jnp.asarray(sp.uv), jnp.asarray(sp.obs_w),
            jnp.asarray(sp.fixed_cams), jnp.float32(1e-3),
            jnp.float32(1e9),
        )
        comm = collective_stats(
            solver.lower(*operands).compile().as_text())
        t0 = time.perf_counter()
        _, _, _, cost = run_dist_ba(sp, mesh, max_iters=3)
        dt = time.perf_counter() - t0
        r = dict(cams=c, pts=p, obs=len(ci), mesh=args.mesh,
                 final_cost=float(cost), wall_s_3it=round(dt, 1),
                 collectives={k: [v["count"], round(v["bytes"] / 1024, 1)]
                              for k, v in comm.items()})
        results.append(r)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
