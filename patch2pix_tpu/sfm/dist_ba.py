"""Distributed Schur-complement bundle adjustment over a device mesh.

The BASELINE.json north star: "keyframes/map blocks partitioned across
a multi-host TPU pod slice and the reduced camera system solved over
ICI collectives (psum/all-gather)".

Partitioning: POINTS (and with them all their observations and all
Schur pair terms, which never cross points) are sharded over the
``ba`` mesh axis; camera poses are replicated. Each shard computes its
partial camera-Hessian blocks (U, b_c) and partial reduced system S;
one ``psum`` over ICI assembles the exact global reduced camera
system, every shard solves the (small) dense system redundantly, and
point updates are embarrassingly shard-local. The only communication
per LM iteration is psum(S) + psum(b) — O(C^2) floats, independent of
the number of points/observations.

Numerically identical to :mod:`patch2pix_tpu.sfm.ba` (tested on the
8-device CPU mesh in tests/test_sfm_dist.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from patch2pix_tpu.sfm.ba import (
    BAProblem,
    cost,
    huber_weights,
    residuals_and_jacobians,
    so3_exp,
)


class ShardedBA(NamedTuple):
    """Host-side layout of a BA problem partitioned over n_shards.

    Point/observation/pair arrays have a leading shard axis; camera
    arrays are replicated. ``X_map`` maps (shard, local_pt) back to the
    global point id (-1 = padding).
    """

    Rs: np.ndarray
    ts: np.ndarray
    X: np.ndarray  # (S, Pl, 3)
    cam_idx: np.ndarray  # (S, Ml)
    pt_idx: np.ndarray  # (S, Ml) LOCAL point indices
    uv: np.ndarray  # (S, Ml, 2)
    obs_w: np.ndarray  # (S, Ml)
    pair_a: np.ndarray  # (S, Ql) block-sorted
    pair_b: np.ndarray  # (S, Ql)
    pair_seg: np.ndarray  # (S, Ql) Schur segment per pair
    seg_ca: np.ndarray  # (S, Qs) unique block row coords
    seg_cb: np.ndarray  # (S, Qs) unique block col coords
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
    """Partition points round-robin by observation count (greedy
    balance), pad every shard to equal sizes."""
    P_ = X.shape[0]
    obs_per_pt = np.bincount(pt_idx, minlength=P_)
    order = np.argsort(-obs_per_pt, kind="stable")
    shard_of = np.zeros(P_, np.int64)
    loads = np.zeros(n_shards, np.int64)
    for pj in order:
        s = int(np.argmin(loads))
        shard_of[pj] = s
        loads[s] += obs_per_pt[pj] ** 2 + 1
    shard_pts = [np.where(shard_of == s)[0] for s in range(n_shards)]

    Pl = max(max(len(sp) for sp in shard_pts), 1)
    obs_shards, pair_shards = [], []
    for s in range(n_shards):
        sel = np.isin(pt_idx, shard_pts[s])
        ids = np.where(sel)[0]
        # local point reindex
        g2l = {g: l for l, g in enumerate(shard_pts[s])}
        lp = np.asarray([g2l[g] for g in pt_idx[ids]], np.int64) if len(ids) else np.zeros(0, np.int64)
        obs_shards.append((cam_idx[ids], lp, uv[ids]))
        # local pairs
        k = np.argsort(lp, kind="stable")
        lp_sorted = lp[k]
        pa, pb = [], []
        for l in range(len(shard_pts[s])):
            s0 = np.searchsorted(lp_sorted, l)
            e0 = np.searchsorted(lp_sorted, l, side="right")
            loc = k[s0:e0]
            if len(loc):
                aa, bb = np.meshgrid(loc, loc, indexing="ij")
                pa.append(aa.ravel())
                pb.append(bb.ravel())
        pair_shards.append(
            (
                np.concatenate(pa) if pa else np.zeros(0, np.int64),
                np.concatenate(pb) if pb else np.zeros(0, np.int64),
            )
        )

    # +1 guarantees a zero-weight obs slot at Ml-1 on every shard:
    # padded PAIRS point at it, so their Schur contribution is exactly
    # zero (W of a zero-weight observation vanishes)
    Ml = max(max(len(o[0]) for o in obs_shards), 1) + 1

    from patch2pix_tpu.sfm.ba import _sort_pairs_by_block

    sorted_pairs = []
    for sh in range(n_shards):
        c, l, u = obs_shards[sh]
        qa, qb = pair_shards[sh]
        sorted_pairs.append(_sort_pairs_by_block(qa, qb, c, C_limit(Rs)))
    Ql = max(max(len(spr[0]) for spr in sorted_pairs), 1)
    Qs = max(max(len(spr[3]) for spr in sorted_pairs), 1)

    Xs = np.zeros((n_shards, Pl, 3), np.float32)
    Xmap = np.full((n_shards, Pl), -1, np.int64)
    ci = np.zeros((n_shards, Ml), np.int64)
    pi = np.zeros((n_shards, Ml), np.int64)
    uvs = np.zeros((n_shards, Ml, 2), np.float32)
    w = np.zeros((n_shards, Ml), np.float32)
    pa = np.full((n_shards, Ql), Ml - 1, np.int64)
    pb = np.full((n_shards, Ql), Ml - 1, np.int64)
    pseg = np.zeros((n_shards, Ql), np.int64)
    sca = np.zeros((n_shards, Qs), np.int64)
    scb = np.zeros((n_shards, Qs), np.int64)
    for s in range(n_shards):
        sp = shard_pts[s]
        Xs[s, : len(sp)] = X[sp]
        Xmap[s, : len(sp)] = sp
        c, l, u = obs_shards[s]
        m = len(c)
        ci[s, :m], pi[s, :m], uvs[s, :m] = c, l, u
        w[s, :m] = 1.0
        qa, qb, seg, ca_u, cb_u = sorted_pairs[s]
        pa[s, : len(qa)], pb[s, : len(qb)] = qa, qb
        pseg[s, : len(seg)] = seg
        sca[s, : len(ca_u)], scb[s, : len(cb_u)] = ca_u, cb_u

    C = Rs.shape[0]
    if fixed_cams is None:
        fixed = np.zeros(C, bool)
        fixed[0] = True
    else:
        fixed = np.asarray(fixed_cams, bool)
    return ShardedBA(
        Rs.astype(np.float32), ts.astype(np.float32), Xs, ci, pi, uvs, w,
        pa, pb, pseg, sca, scb, fixed, Xmap,
    )


def C_limit(Rs) -> int:
    return Rs.shape[0]


def _local_blocks(p: BAProblem, lm_lambda, huber_delta, use_huber, C):
    """Shard-local Hessian blocks; mirrors the math in ba.ba_step."""
    Pl = p.X.shape[0]
    r, Jc, Jp, w_obs = residuals_and_jacobians(p)
    w = w_obs * (huber_weights(r, huber_delta) if use_huber else 1.0)
    wJc = Jc * w[:, None, None]
    wJp = Jp * w[:, None, None]

    U = jax.ops.segment_sum(
        jnp.einsum("mki,mkj->mij", wJc, Jc), p.cam_idx, num_segments=C
    )
    V = jax.ops.segment_sum(
        jnp.einsum("mki,mkj->mij", wJp, Jp), p.pt_idx, num_segments=Pl
    )
    W = jnp.einsum("mki,mkj->mij", wJc, Jp)
    bc = -jax.ops.segment_sum(
        jnp.einsum("mki,mk->mi", wJc, r), p.cam_idx, num_segments=C
    )
    bp = -jax.ops.segment_sum(
        jnp.einsum("mki,mk->mi", wJp, r), p.pt_idx, num_segments=Pl
    )

    V = V + lm_lambda * jnp.eye(3)[None] * jnp.maximum(
        jnp.trace(V, axis1=1, axis2=2) / 3.0, 1e-6
    )[:, None, None]
    Vinv = jnp.linalg.inv(V + 1e-9 * jnp.eye(3))

    Y = W @ Vinv[p.pt_idx]
    pair_blocks = jnp.einsum("qik,qjk->qij", Y[p.pair_a], W[p.pair_b])
    seg_blocks = jax.ops.segment_sum(
        pair_blocks, p.pair_seg, num_segments=p.seg_ca.shape[0]
    )
    S = jnp.zeros((C, C, 6, 6), jnp.float32)
    S = S.at[p.seg_ca, p.seg_cb].add(-seg_blocks)

    b_red = bc - jax.ops.segment_sum(
        jnp.einsum("mij,mj->mi", Y, bp[p.pt_idx]), p.cam_idx, num_segments=C
    )
    return U, S, b_red, W, Vinv, bp


def make_dist_ba_step(mesh: Mesh, C: int, use_huber: bool = True):
    """Build the mesh-sharded LM step (jitted; shards over axis 'ba')."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def step(Rs, ts, X, cam_idx, pt_idx, uv, obs_w, pair_a, pair_b,
             pair_seg, seg_ca, seg_cb, fixed, lam, hd):
        # inside: leading shard axis stripped -> local arrays
        p = BAProblem(
            Rs=Rs, ts=ts, X=X[0], cam_idx=cam_idx[0], pt_idx=pt_idx[0],
            uv=uv[0], obs_w=obs_w[0], pair_a=pair_a[0], pair_b=pair_b[0],
            pair_seg=pair_seg[0], seg_ca=seg_ca[0], seg_cb=seg_cb[0],
            fixed_cams=fixed,
        )
        U, S, b_red, W, Vinv, bp = _local_blocks(p, lam, hd, use_huber, C)

        # assemble the exact global reduced camera system over ICI
        U = jax.lax.psum(U, "ba")
        S = jax.lax.psum(S, "ba")
        b_red = jax.lax.psum(b_red, "ba")

        U_damped = U + lam * jnp.eye(6)[None] * jnp.maximum(
            jnp.trace(U, axis1=1, axis2=2) / 6.0, 1e-6
        )[:, None, None]
        S = S.at[jnp.arange(C), jnp.arange(C)].add(U_damped)

        free = (~fixed).astype(jnp.float32)
        mask2 = free[:, None] * free[None, :]
        S = S * mask2[:, :, None, None]
        eye_fix = jnp.eye(6)[None] * fixed.astype(jnp.float32)[:, None, None]
        S = S.at[jnp.arange(C), jnp.arange(C)].add(eye_fix)
        b_red = b_red * free[:, None]

        Sd = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
        dc = jnp.linalg.solve(Sd, b_red.reshape(-1)).reshape(C, 6)
        dc = dc * free[:, None]

        # shard-local point updates
        Wt_dc = jax.ops.segment_sum(
            jnp.einsum("mij,mi->mj", W, dc[p.cam_idx]), p.pt_idx,
            num_segments=p.X.shape[0],
        )
        dp = jnp.einsum("pij,pj->pi", Vinv, bp - Wt_dc)

        dR = so3_exp(dc[:, :3])
        new_Rs = dR @ Rs
        new_ts = jnp.einsum("cij,cj->ci", dR, ts) + dc[:, 3:]
        new_X = p.X + dp

        # local robust cost of the updated state
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
            P("ba"), P("ba"), P("ba"), P("ba"), P("ba"), P(), P(), P(),
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
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """LM driver over the mesh-sharded step.

    Returns (Rs, ts, X_global, final_cost).
    """
    use_huber = np.isfinite(huber_delta)
    C = sp.Rs.shape[0]
    step = make_dist_ba_step(mesh, C, use_huber)
    hd = jnp.float32(huber_delta if use_huber else 1e9)

    Rs = jnp.asarray(sp.Rs)
    ts = jnp.asarray(sp.ts)
    X = jnp.asarray(sp.X)
    args = (
        jnp.asarray(sp.cam_idx, jnp.int32),
        jnp.asarray(sp.pt_idx, jnp.int32),
        jnp.asarray(sp.uv),
        jnp.asarray(sp.obs_w),
        jnp.asarray(sp.pair_a, jnp.int32),
        jnp.asarray(sp.pair_b, jnp.int32),
        jnp.asarray(sp.pair_seg, jnp.int32),
        jnp.asarray(sp.seg_ca, jnp.int32),
        jnp.asarray(sp.seg_cb, jnp.int32),
        jnp.asarray(sp.fixed_cams),
    )
    lam = init_lambda
    cur = None
    for _ in range(max_iters):
        nR, nt, nX, new_cost, old_cost = step(
            Rs, ts, X, *args, jnp.float32(lam), hd
        )
        if cur is None:
            cur = float(old_cost)
        new_cost = float(new_cost)
        if new_cost < cur:
            rel = (cur - new_cost) / max(cur, 1e-12)
            Rs, ts, X, cur = nR, nt, nX, new_cost
            lam = max(lam * 0.5, 1e-9)
            if rel < tol:
                break
        else:
            lam = min(lam * 4.0, 1e6)
            if lam >= 1e6:
                break

    # scatter local points back to global order
    Xg = np.zeros((int(sp.X_map.max()) + 1, 3), np.float32)
    Xl = np.asarray(X)
    for s in range(sp.X_map.shape[0]):
        m = sp.X_map[s] >= 0
        Xg[sp.X_map[s][m]] = Xl[s][m]
    return np.asarray(Rs), np.asarray(ts), Xg, cur
