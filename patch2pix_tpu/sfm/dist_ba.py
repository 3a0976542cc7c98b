"""Distributed Schur-complement bundle adjustment over a device mesh.

The BASELINE.json north star: "keyframes/map blocks partitioned across
a multi-host TPU pod slice and the reduced camera system solved over
ICI collectives (psum/all-gather)".

Partitioning: POINTS (and with them all their observations) are
sharded over the ``ba`` mesh axis; camera poses are replicated. Each
shard computes its partial camera-Hessian blocks (U, b_c) and its
partial Schur cross term via the dense-B trick (one local
``Bt^T @ Bt`` matmul — the cross term is additive over points, so
point-sharding makes it embarrassingly parallel); one ``psum`` over
ICI assembles the exact global reduced camera system, every shard
solves the (small) dense system redundantly, and point updates are
shard-local. The only communication per LM iteration is psum(S) +
psum(b) — O(C^2) floats, independent of the number of points or
observations.

Numerically identical to :mod:`patch2pix_tpu.sfm.ba` (exact one-step
parity on the 8-device CPU mesh, including deliberately unbalanced
shards — padded observations carry zero weight and contribute exactly
nothing; tests/test_sfm_dist.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from patch2pix_tpu.sfm.ba import (
    BAProblem,
    apply_updates,
    backsub_points,
    cost,
    schur_blocks,
    solve_reduced,
)


class ShardedBA(NamedTuple):
    """Host-side layout of a BA problem partitioned over n_shards.

    Point/observation arrays have a leading shard axis; camera arrays
    are replicated. ``X_map`` maps (shard, local_pt) back to the
    global point id (-1 = padding). Padded observations have
    ``obs_w = 0`` and contribute nothing to any Hessian block.
    """

    Rs: np.ndarray
    ts: np.ndarray
    X: np.ndarray  # (S, Pl, 3)
    cam_idx: np.ndarray  # (S, Ml)
    pt_idx: np.ndarray  # (S, Ml) LOCAL point indices
    uv: np.ndarray  # (S, Ml, 2)
    obs_w: np.ndarray  # (S, Ml)
    fixed_cams: np.ndarray  # (C,)
    X_map: np.ndarray  # (S, Pl) global point ids


def shard_problem(
    Rs: np.ndarray,
    ts: np.ndarray,
    X: np.ndarray,
    cam_idx: np.ndarray,
    pt_idx: np.ndarray,
    uv: np.ndarray,
    n_shards: int,
    fixed_cams=None,
) -> ShardedBA:
    """Partition points greedily by observation count (balance), pad
    every shard to equal sizes with zero-weight observations."""
    P_ = X.shape[0]
    cam_idx = np.asarray(cam_idx)
    pt_idx = np.asarray(pt_idx)
    uv = np.asarray(uv)
    obs_per_pt = np.bincount(pt_idx, minlength=P_)
    order = np.argsort(-obs_per_pt, kind="stable")
    shard_of = np.zeros(P_, np.int64)
    loads = np.zeros(n_shards, np.int64)
    for pj in order:
        s = int(np.argmin(loads))
        shard_of[pj] = s
        loads[s] += obs_per_pt[pj] + 1
    shard_pts = [np.where(shard_of == s)[0] for s in range(n_shards)]

    Pl = max(max(len(sp) for sp in shard_pts), 1)
    obs_shards = []
    for s in range(n_shards):
        ids = np.where(np.isin(pt_idx, shard_pts[s]))[0]
        g2l = {g: l for l, g in enumerate(shard_pts[s])}
        lp = (
            np.asarray([g2l[g] for g in pt_idx[ids]], np.int64)
            if len(ids) else np.zeros(0, np.int64)
        )
        obs_shards.append((cam_idx[ids], lp, uv[ids]))

    Ml = max(max(len(o[0]) for o in obs_shards), 1)
    Xs = np.zeros((n_shards, Pl, 3), np.float32)
    Xmap = np.full((n_shards, Pl), -1, np.int64)
    ci = np.zeros((n_shards, Ml), np.int64)
    pi = np.zeros((n_shards, Ml), np.int64)
    uvs = np.zeros((n_shards, Ml, 2), np.float32)
    w = np.zeros((n_shards, Ml), np.float32)
    for s in range(n_shards):
        sp = shard_pts[s]
        Xs[s, : len(sp)] = X[sp]
        Xmap[s, : len(sp)] = sp
        c, l, u = obs_shards[s]
        m = len(c)
        ci[s, :m], pi[s, :m], uvs[s, :m] = c, l, u
        w[s, :m] = 1.0

    C = Rs.shape[0]
    if fixed_cams is None:
        fixed = np.zeros(C, bool)
        fixed[0] = True
    else:
        fixed = np.asarray(fixed_cams, bool)
    return ShardedBA(
        Rs.astype(np.float32), ts.astype(np.float32), Xs, ci, pi, uvs, w,
        fixed, Xmap,
    )


def make_dist_ba_step(mesh: Mesh, C: int, use_huber: bool = True):
    """Build the mesh-sharded LM step (jitted; shards over axis 'ba')."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def step(Rs, ts, X, cam_idx, pt_idx, uv, obs_w, fixed, lam, hd):
        # inside: leading shard axis stripped -> local arrays
        p = BAProblem(
            Rs=Rs, ts=ts, X=X[0], cam_idx=cam_idx[0], pt_idx=pt_idx[0],
            uv=uv[0], obs_w=obs_w[0], fixed_cams=fixed,
        )
        S_cross_neg, U, b_red, W, Vinv, bp = schur_blocks(
            p, lam, hd, use_huber, C
        )

        # assemble the exact global reduced camera system over ICI
        S_cross_neg = jax.lax.psum(S_cross_neg, "ba")
        U = jax.lax.psum(U, "ba")
        b_red = jax.lax.psum(b_red, "ba")

        dc = solve_reduced(S_cross_neg, U, b_red, lam, fixed)
        dp = backsub_points(p, W, Vinv, bp, dc)
        new_Rs, new_ts, new_X = apply_updates(Rs, ts, p.X, dc, dp)

        p_new = p._replace(Rs=new_Rs, ts=new_ts, X=new_X)
        hd_or_none = hd if use_huber else None
        new_cost = jax.lax.psum(cost(p_new, hd_or_none), "ba")
        old_cost = jax.lax.psum(cost(p, hd_or_none), "ba")
        return new_Rs, new_ts, new_X[None], new_cost, old_cost

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P(), P(), P("ba"), P("ba"), P("ba"), P("ba"), P("ba"),
            P(), P(), P(),
        ),
        out_specs=(P(), P(), P("ba"), P(), P()),
    )
    return jax.jit(sharded)


def make_dist_ba_solver(
    mesh: Mesh, C: int, use_huber: bool, max_iters: int, tol: float,
    debug_checks: bool = False,
):
    """Build the FULLY on-device LM solver (one jitted program).

    The accept/reject damping logic lives inside a ``lax.while_loop``
    within the shard_map, so the entire multi-iteration solve runs with
    ZERO host round-trips — round 1 synced ``float(new_cost)`` to the
    host every iteration, which serialises the solver against host
    latency and caps multi-host scaling. Collectives (the psum of the
    reduced camera system and of the cost) ride ICI inside the loop;
    the damping state (lam, cost) is computed redundantly-replicated on
    every shard, so no extra communication is introduced.

    ``debug_checks`` is the SURVEY §5 race-detection prescription for
    multi-host runs: the psum-assembled reduced camera system and the
    LM cost are REPLICATED state — after every psum each shard must
    hold the same blocks up to all-reduce accumulation-order rounding
    (~1e-7 relative). The debug build checksums them and tracks the
    maximum relative cross-shard divergence through the whole solve;
    anything above the rounding floor means a desynchronised shard
    (corrupted collective, host-dependent input skew, nondeterministic
    op) and fails the run loudly instead of silently corrupting poses.
    Costs two scalar collectives per iteration, debug mode only.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def solve(Rs, ts, X, cam_idx, pt_idx, uv, obs_w, fixed, lam0, hd):
        p0 = BAProblem(
            Rs=Rs, ts=ts, X=X[0], cam_idx=cam_idx[0], pt_idx=pt_idx[0],
            uv=uv[0], obs_w=obs_w[0], fixed_cams=fixed,
        )
        hd_or_none = hd if use_huber else None
        cur0 = jax.lax.psum(cost(p0, hd_or_none), "ba")

        def replicated_divergence(*blocks):
            """Max RELATIVE cross-shard deviation of a checksum of
            state that must be replicated after the psums.

            Not an exact-equality test: XLA's all-reduce may accumulate
            in a participant-dependent order (measured ~1e-7 relative
            jitter on the CPU fake mesh), so replicated state agrees to
            reduction rounding, not bitwise. A desynchronised shard
            (corrupted collective, skewed host input) shows up orders
            of magnitude above that."""
            chk = jnp.float32(0.0)
            for blk in blocks:
                chk = chk + jnp.sum(jnp.abs(blk).astype(jnp.float32))
            n = jax.lax.psum(jnp.float32(1.0), "ba")
            mean = jax.lax.psum(chk, "ba") / n
            dev = jax.lax.pmax(jnp.abs(chk - mean), "ba")
            return dev / jnp.maximum(jnp.abs(mean), 1e-30)

        def lm_cond(carry):
            _, _, _, lam, _, it, done, _ = carry
            return (it < max_iters) & (~done) & (lam < 1e6)

        def lm_body(carry):
            Rs, ts, Xl, lam, cur, it, done, maxdiv = carry
            p = BAProblem(
                Rs=Rs, ts=ts, X=Xl, cam_idx=cam_idx[0], pt_idx=pt_idx[0],
                uv=uv[0], obs_w=obs_w[0], fixed_cams=fixed,
            )
            S_cross_neg, U, b_red, W, Vinv, bp = schur_blocks(
                p, lam, hd, use_huber, C
            )
            S_cross_neg = jax.lax.psum(S_cross_neg, "ba")
            U = jax.lax.psum(U, "ba")
            b_red = jax.lax.psum(b_red, "ba")
            dc = solve_reduced(S_cross_neg, U, b_red, lam, fixed)
            dp = backsub_points(p, W, Vinv, bp, dc)
            nR, nt, nX = apply_updates(Rs, ts, Xl, dc, dp)
            new_cost = jax.lax.psum(
                cost(p._replace(Rs=nR, ts=nt, X=nX), hd_or_none), "ba"
            )
            accept = new_cost < cur
            rel = (cur - new_cost) / jnp.maximum(cur, 1e-12)
            Rs = jnp.where(accept, nR, Rs)
            ts = jnp.where(accept, nt, ts)
            Xl = jnp.where(accept, nX, Xl)
            cur = jnp.where(accept, new_cost, cur)
            lam = jnp.where(
                accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6)
            )
            done = accept & (rel < tol)
            if debug_checks:
                maxdiv = jnp.maximum(
                    maxdiv,
                    replicated_divergence(
                        S_cross_neg, U, b_red, new_cost, lam
                    ),
                )
            return Rs, ts, Xl, lam, cur, it + 1, done, maxdiv

        Rsf, tsf, Xf, _, curf, _, _, maxdiv = jax.lax.while_loop(
            lm_cond, lm_body,
            (Rs, ts, X[0], lam0, cur0, jnp.int32(0), jnp.asarray(False),
             jnp.float32(0.0)),
        )
        return Rsf, tsf, Xf[None], curf, maxdiv

    sharded = shard_map(
        solve,
        mesh=mesh,
        in_specs=(
            P(), P(), P("ba"), P("ba"), P("ba"), P("ba"), P("ba"),
            P(), P(), P(),
        ),
        out_specs=(P(), P(), P("ba"), P(), P()),
    )
    return jax.jit(sharded)


def run_dist_ba(
    sp: ShardedBA,
    mesh: Mesh,
    max_iters: int = 30,
    init_lambda: float = 1e-3,
    huber_delta: float = float("inf"),
    tol: float = 1e-8,
    debug_checks: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """LM driver over the mesh-sharded on-device solver.

    Returns (Rs, ts, X_global, final_cost). ONE jit call executes the
    whole LM schedule on device; the only host sync is the final
    result fetch. With ``debug_checks`` the replicated reduced-system
    blocks are checksummed across shards every iteration and any
    divergence raises (SURVEY §5 race detection for multi-host runs).
    """
    use_huber = np.isfinite(huber_delta)
    C = sp.Rs.shape[0]
    solver = make_dist_ba_solver(
        mesh, C, use_huber, max_iters, tol, debug_checks=debug_checks
    )
    hd = jnp.float32(huber_delta if use_huber else 1e9)

    Rs, ts, X, cur, maxdiv = solver(
        jnp.asarray(sp.Rs),
        jnp.asarray(sp.ts),
        jnp.asarray(sp.X),
        jnp.asarray(sp.cam_idx, jnp.int32),
        jnp.asarray(sp.pt_idx, jnp.int32),
        jnp.asarray(sp.uv),
        jnp.asarray(sp.obs_w),
        jnp.asarray(sp.fixed_cams),
        jnp.float32(init_lambda),
        hd,
    )
    cur = float(cur)
    if debug_checks:
        div = float(np.asarray(maxdiv).ravel()[0])
        if div > 1e-5:
            raise RuntimeError(
                f"dist BA shards desynchronised: max replicated-state "
                f"relative checksum divergence {div:.3e} (all-reduce "
                f"rounding jitter is ~1e-7; anything larger means a "
                f"shard is out of sync)"
            )

    # scatter local points back to global order
    Xg = np.zeros((int(sp.X_map.max()) + 1, 3), np.float32)
    Xl = np.asarray(X)
    for s in range(sp.X_map.shape[0]):
        m = sp.X_map[s] >= 0
        Xg[sp.X_map[s][m]] = Xl[s][m]
    return np.asarray(Rs), np.asarray(ts), Xg, cur
