"""Micro-profile of the fine-stage tiled patch gather's sub-parts.

The round-2 stage budget shows fine_gather_regress at ~29 ms vs
mid_gather_regress at ~9.6 ms (identical regressor work) — the
superblock row-gather is ~22 ms of a 56 ms iteration. This script
times its internals per pyramid level with the in-jit marginal method
so the pathology is attributable: space-to-depth tile construction,
the 4-row gather, or the within-superblock expansion.

Usage: python tools/profile_gather.py [--change_stride]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp

H, W = 768, 1024
BATCH = 2
LO, HI = 2, 8


def marginal(fn, *args, lo=LO, hi=HI):
    def timed(iters):
        float(fn(*args, iters))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args, iters))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(hi) - timed(lo)) / (hi - lo)


def loopify(body_fn):
    @functools.partial(jax.jit, static_argnums=1)
    def run(x, iters):
        def body(i, carry):
            x, acc = carry
            s = body_fn(x, i)
            bump = (s * 1e-20).astype(x.dtype)
            return x + bump, acc + s.astype(jnp.float32)

        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return acc

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--change_stride", action="store_true")
    ap.add_argument("--n", type=int, default=None)
    args = ap.parse_args()

    up = 8 if args.change_stride else 16
    n = args.n or (H // up // 2) * (W // up // 2)  # nb rows, the eval fine count
    psize = 16

    # pyramid levels as in the model: im, conv1, layer1, layer2
    levels = [
        ((BATCH, H, W, 3), jnp.float32, 1),
        ((BATCH, H // 2, W // 2, 64), jnp.bfloat16, 2),
        ((BATCH, H // 4, W // 4, 64), jnp.bfloat16, 4),
        ((BATCH, H // 8, W // 8, 128), jnp.bfloat16, 8),
    ]
    feats = [
        jax.random.normal(jax.random.PRNGKey(i), s, jnp.float32).astype(d)
        for i, (s, d, _) in enumerate(levels)
    ]
    key = jax.random.PRNGKey(9)
    pts = jax.random.uniform(
        key, (BATCH, n, 2), minval=8.0, maxval=float(min(H, W)) - 8.0
    )

    from patch2pix_tpu.ops.patch_gather import (
        _gather_level_flat,
        _gather_level_tiled,
        gather_local_patches_tiled,
        gather_local_patches_tiled_levels,
    )

    x0 = pts[..., 0].astype(jnp.int32) - psize // 2
    y0 = pts[..., 1].astype(jnp.int32) - psize // 2

    print(f"n={n} proposals, psize={psize}")

    # full gather (all levels + l2norm), for reference
    def full(p, i):
        out = gather_local_patches_tiled(
            feats, p, (0, 1, 2, 3), (1, 2, 2, 2, 2), psize
        )
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    t = marginal(loopify(full), pts)
    print(f"{'full gather+l2norm':28s} {t * 1e3:8.2f} ms")

    def full_hybrid(p, i):
        lv, inv = gather_local_patches_tiled_levels(
            feats, p, (0, 1, 2, 3), (1, 2, 2, 2, 2), psize
        )
        return sum(
            jnp.sum((l.astype(jnp.float32) * inv)) for l in lv
        ) * 1e-9

    t = marginal(loopify(full_hybrid), pts)
    print(f"{'full HYBRID levels gather':28s} {t * 1e3:8.2f} ms")

    x0p = jnp.clip(x0 + psize, 0, W + psize - 1)
    y0p = jnp.clip(y0 + psize, 0, H + psize - 1)
    for li, (fmap, (_, _, ds)) in enumerate(zip(feats, levels)):
        def level_flat(fm, i, ds=ds):
            out = _gather_level_flat(fm, y0p, x0p, psize, ds)
            return jnp.sum(out.astype(jnp.float32)) * 1e-9

        t = marginal(loopify(level_flat), fmap)
        print(f"{'level %d (ds=%d) FLAT' % (li, ds):28s} {t * 1e3:8.2f} ms")

    # experimental: one-hot selection-matmul expansion (MXU instead of
    # chained takes) for the fat-channel levels
    def level_onehot(fm, i, ds):
        b, h, w, c = fm.shape
        t_ = psize // ds
        fp = jnp.pad(fm, ((0, 0), (t_, t_), (t_, t_), (0, 0)), mode="edge")
        nty, ntx = h // t_ + 2, w // t_ + 2
        tiles = fp.reshape(b, nty, t_, ntx, t_ * c)
        tiles = tiles.transpose(0, 1, 3, 2, 4).reshape(
            b, nty * ntx, t_ * t_ * c
        )
        ky = y0p // psize
        kx = x0p // psize
        dyx = jnp.asarray([[0, 0], [0, 1], [1, 0], [1, 1]], jnp.int32)
        lin = ((ky[..., None] + dyx[None, None, :, 0]) * ntx
               + (kx[..., None] + dyx[None, None, :, 1]))
        rows = jnp.take_along_axis(
            tiles, lin.reshape(b, n * 4, 1), axis=1
        ).reshape(b, n, 2, 2, t_, t_ * c)
        # (ty, wy) adjacent per tx half: (B, N, 2tx, 2t*t*c grouped)
        blk = rows.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, n, 2, 2 * t_, t_ * c
        )
        iy = (y0p[..., None] + jnp.arange(psize)) // ds - ky[..., None] * t_
        ix = (x0p[..., None] + jnp.arange(psize)) // ds - kx[..., None] * t_
        sy = (iy[..., None] == jnp.arange(2 * t_)).astype(fm.dtype)
        # y-select: (B, N, p, 2t) @ (B, N, 2, 2t, t*c) -> (B, N, 2, p, t*c)
        mid = jnp.einsum("bnpk,bnxkc->bnxpc", sy, blk,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        wide = mid.transpose(0, 1, 3, 2, 4).reshape(
            b, n, psize, 2, t_, c
        ).reshape(b, n, psize, 2 * t_, c)
        sx = (ix[..., None] == jnp.arange(2 * t_)).astype(jnp.float32)
        out = jnp.einsum("bnqk,bnpkc->bnpqc", sx, wide,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(out) * 1e-9

    for li, (fmap, (_, _, ds)) in enumerate(zip(feats, levels)):
        if fmap.shape[-1] <= 16:
            continue
        t = marginal(loopify(functools.partial(level_onehot, ds=ds)), fmap)
        print(f"{'level %d (ds=%d) ONEHOT' % (li, ds):28s} {t * 1e3:8.2f} ms")

    # level-0 candidates: one-hot on the skinny image level, and the
    # flat expansion on a pre-cast bf16 image
    t = marginal(loopify(functools.partial(level_onehot, ds=1)), feats[0])
    print(f"{'level 0 (ds=1) ONEHOT f32':28s} {t * 1e3:8.2f} ms")
    t = marginal(
        loopify(functools.partial(level_onehot, ds=1)),
        feats[0].astype(jnp.bfloat16),
    )
    print(f"{'level 0 (ds=1) ONEHOT bf16':28s} {t * 1e3:8.2f} ms")
    t = marginal(
        loopify(lambda fm, i: jnp.sum(
            _gather_level_flat(fm, y0p, x0p, psize, 1).astype(jnp.float32)
        ) * 1e-9),
        feats[0].astype(jnp.bfloat16),
    )
    print(f"{'level 0 (ds=1) FLAT bf16':28s} {t * 1e3:8.2f} ms")

    for li, (fmap, (_, _, ds)) in enumerate(zip(feats, levels)):
        def level(fm, i, ds=ds):
            out = _gather_level_tiled(fm, y0, x0, psize, ds, psize)
            return jnp.sum(out.astype(jnp.float32)) * 1e-9

        t = marginal(loopify(level), fmap)
        print(f"{'level %d (ds=%d) all' % (li, ds):28s} {t * 1e3:8.2f} ms")

        # sub-part A: space-to-depth tiles
        b, h, w, c = fmap.shape
        tpx = psize
        tside = tpx // ds
        nty, ntx = h // tside, w // tside

        def s2d(fm, i, tside=tside, nty=nty, ntx=ntx, c=c, b=b):
            tiles = fm.reshape(b, nty, tside, ntx, tside, c)
            tiles = tiles.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, nty * ntx, tside * tside * c
            )
            return jnp.sum(tiles[:, ::17].astype(jnp.float32)) * 1e-9

        t = marginal(loopify(s2d), fmap)
        print(f"{'  s2d tiles':28s} {t * 1e3:8.2f} ms")

        # sub-part B: 4-row gather
        tiles = fmap.reshape(b, nty, tside, ntx, tside, c)
        tiles = tiles.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, nty * ntx, tside * tside * c
        )
        ky = jnp.clip(y0 // tpx, 0, nty - 2)
        kx = jnp.clip(x0 // tpx, 0, ntx - 2)
        dyx = jnp.asarray([[0, 0], [0, 1], [1, 0], [1, 1]], jnp.int32)
        lin = (
            (ky[..., None] + dyx[None, None, :, 0]) * ntx
            + (kx[..., None] + dyx[None, None, :, 1])
        )

        def rowgather(tl, i, lin=lin, b=b, n=n):
            rows = jnp.take_along_axis(
                tl, lin.reshape(b, n * 4, 1), axis=1
            )
            return jnp.sum(rows[:, ::13].astype(jnp.float32)) * 1e-9

        t = marginal(loopify(rowgather), tiles)
        print(f"{'  4-row gather':28s} {t * 1e3:8.2f} ms")

        # sub-part C: expansion (transpose + 2 chained takes)
        rows = jnp.take_along_axis(tiles, lin.reshape(b, n * 4, 1), axis=1)

        def expand(rw, i, tside=tside, c=c, b=b, n=n, ds=ds, h=h, w=w,
                   ky=ky, kx=kx):
            blk = rw.reshape(b, n, 2, 2, tside, tside, c)
            blk = blk.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
                b, n, 2 * tside, 2 * tside, c
            )
            d = jnp.arange(psize)
            iy = jnp.clip((y0[..., None] + d) // ds, 0, h - 1) - ky[..., None] * tside
            ix = jnp.clip((x0[..., None] + d) // ds, 0, w - 1) - kx[..., None] * tside
            iy = jnp.clip(iy, 0, 2 * tside - 1)
            ix = jnp.clip(ix, 0, 2 * tside - 1)
            out = jnp.take_along_axis(blk, iy[..., None, None], axis=2)
            out = jnp.take_along_axis(out, ix[:, :, None, :, None], axis=3)
            return jnp.sum(out.astype(jnp.float32)) * 1e-9

        t = marginal(loopify(expand), rows)
        print(f"{'  expansion':28s} {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
