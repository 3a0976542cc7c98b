"""Micro-profile of the coarse correlation+pool+mutual+NCN block.

The change_stride stage budget shows corr_pool_mutual_ncn at ~91 ms of
a 180 ms iteration (roofline estimate for its FLOPs+traffic is ~10 ms).
This times each sub-op separately with the in-jit marginal method:
l2norm, the fused Pallas corr+pool (vs einsum+pool), MutualMatching,
and each NCN conv4d layer (both symmetric branches).

Usage: python tools/profile_coarse.py [--change_stride]
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
    args = ap.parse_args()

    from patch2pix_tpu.ops.correlation import (
        feat_correlation,
        l2_normalize,
        maxpool4d_values,
        mutual_matching,
    )
    from patch2pix_tpu.ops.corr_pool_pallas import (
        corr_pool_fused,
        corr_pool_supported,
    )
    from patch2pix_tpu.ops.conv4d import (
        conv4d,
        conv4d_fold_in,
        conv4d_fold_out,
        conv4d_transpose_symmetric,
    )

    up = 8 if args.change_stride else 16
    h, w = H // up, W // up
    c = 256
    feat = jax.random.normal(
        jax.random.PRNGKey(0), (BATCH, h, w, c), jnp.float32
    ).astype(jnp.bfloat16)
    feat2 = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, h, w, c), jnp.float32
    ).astype(jnp.bfloat16)
    print(f"feat {feat.shape}, pooled vol ({BATCH},{h//2},{w//2},{h//2},{w//2})")

    t = marginal(loopify(lambda x, i: jnp.sum(
        l2_normalize(x, axis=-1).astype(jnp.float32)) * 1e-9), feat)
    print(f"{'l2norm (x1)':26s} {t * 1e3:8.2f} ms")

    fused_ok = corr_pool_supported(feat, feat2, 2)
    if fused_ok:
        t = marginal(loopify(lambda x, i: jnp.sum(
            corr_pool_fused(x, feat2)) * 1e-9), feat)
        print(f"{'corr_pool_fused':26s} {t * 1e3:8.2f} ms")

    def unfused(x, i):
        return jnp.sum(maxpool4d_values(feat_correlation(x, feat2), 2)) * 1e-9

    t = marginal(loopify(unfused), feat)
    print(f"{'einsum corr + values pool':26s} {t * 1e3:8.2f} ms")

    vol = (
        corr_pool_fused(feat, feat2) if fused_ok
        else maxpool4d_values(feat_correlation(feat, feat2), 2)
    )

    t = marginal(loopify(lambda v, i: jnp.sum(mutual_matching(v)) * 1e-9), vol)
    print(f"{'mutual_matching (x1)':26s} {t * 1e3:8.2f} ms")

    k1 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 3, 3, 1, 16)) * 0.05
    b1 = jnp.zeros((16,))
    k2 = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, 3, 16, 1)) * 0.05
    b2 = jnp.zeros((1,))

    def ncn_l1(v, i):
        y = conv4d(v[..., None].astype(jnp.bfloat16),
                   k1.astype(jnp.bfloat16), b1, out_dtype=jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    t = marginal(loopify(ncn_l1), vol)
    print(f"{'ncn conv4d 1->16':26s} {t * 1e3:8.2f} ms")

    y16 = jax.nn.relu(
        conv4d(vol[..., None].astype(jnp.bfloat16), k1.astype(jnp.bfloat16),
               b1, out_dtype=jnp.bfloat16)
    )

    def ncn_l2(y, i):
        z = conv4d(y, k2.astype(jnp.bfloat16), b2)
        return jnp.sum(z) * 1e-9

    t = marginal(loopify(ncn_l2), y16)
    print(f"{'ncn conv4d 16->1':26s} {t * 1e3:8.2f} ms")

    def ncn_l1_foldin(v, i):
        y = conv4d_fold_in(v[..., None].astype(jnp.bfloat16),
                           k1.astype(jnp.bfloat16), b1,
                           out_dtype=jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    t = marginal(loopify(ncn_l1_foldin), vol)
    print(f"{'ncn 1->16 FOLD-IN':26s} {t * 1e3:8.2f} ms")

    def ncn_l2_foldout(y, i):
        z = conv4d_fold_out(y, k2.astype(jnp.bfloat16), b2)
        return jnp.sum(z) * 1e-9

    t = marginal(loopify(ncn_l2_foldout), y16)
    print(f"{'ncn 16->1 FOLD-OUT':26s} {t * 1e3:8.2f} ms")

    # both symmetric branches of layer 1 in ONE fold-in conv (Cout=32)
    k1b = jnp.concatenate(
        [k1, k1.transpose(2, 3, 0, 1, 4, 5)], axis=-1
    )
    b1b = jnp.concatenate([b1, b1])

    def ncn_l1_foldin_both(v, i):
        y = conv4d_fold_in(v[..., None].astype(jnp.bfloat16),
                           k1b.astype(jnp.bfloat16), b1b,
                           out_dtype=jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    t = marginal(loopify(ncn_l1_foldin_both), vol)
    print(f"{'ncn 1->32 FOLD-IN (sym)':26s} {t * 1e3:8.2f} ms")

    def ncn_l1T(v, i):
        y = conv4d_transpose_symmetric(
            v[..., None].astype(jnp.bfloat16), k1.astype(jnp.bfloat16), b1,
            out_dtype=jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    t = marginal(loopify(ncn_l1T), vol)
    print(f"{'ncn conv4d 1->16 (transp)':26s} {t * 1e3:8.2f} ms")

    def ncn_l2T(y, i):
        z = conv4d_transpose_symmetric(y, k2.astype(jnp.bfloat16), b2)
        return jnp.sum(z) * 1e-9

    t = marginal(loopify(ncn_l2T), y16)
    print(f"{'ncn conv4d 16->1 (transp)':26s} {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
