"""Microbench: regressor conv0 (3x3 stride-2) formulations on real TPU.

The per-op trace (tools/profile_trace.py) attributes ~16 ms/iter at
change_stride scale to conv0 running at ~90 TF/s — half the rate of the
stride-1 conv1 (195 TF/s). Stride-2 convs map poorly onto the MXU's
implicit im2col; candidates measured here:

  a) current: per-segment lax.conv 3x3 stride 2 (NHWC)
  b) space-to-depth: input phases (M,8,8,4C), one 2x2 stride-1 conv
     with the kernel zero-embedded into phase channels (16/9 FLOPs but
     stride-1)
  c) phase-decomposed: 4 stride-1 convs (2x2 / 2x1 / 1x2 / 1x1) on the
     phase slices, summed (exactly 9/9 FLOPs, all stride-1)
  d) s2d with the transpose pre-applied (upper bound for a gather that
     emits phase-major layout directly)

Usage: python tools/profile_conv0.py [--m 2400]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp

SEGS = (3, 64, 64, 128, 3, 64, 64, 128)  # f1 levels + f2 levels
OUT = 512


def marginal(fn, *args, lo=2, hi=8):
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
    @functools.partial(jax.jit, static_argnums=(1,))
    def run(xs, iters):
        def body(i, carry):
            xs, acc = carry
            s = body_fn(xs)
            xs = jax.tree.map(lambda x: x + (s * 1e-20).astype(x.dtype), xs)
            return xs, acc + s.astype(jnp.float32)

        _, acc = jax.lax.fori_loop(0, iters, body, (xs, jnp.float32(0.0)))
        return acc

    return run


def conv(x, k, stride, pad):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2400)
    args = ap.parse_args()
    m = args.m
    dt = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    xs = tuple(
        jax.random.normal(jax.random.fold_in(key, i), (m, 16, 16, c), dt)
        for i, c in enumerate(SEGS)
    )
    ks = tuple(
        jax.random.normal(jax.random.fold_in(key, 100 + i), (3, 3, c, OUT), dt)
        for i, c in enumerate(SEGS)
    )
    # phase-major inputs: (M,16,16,C) -> (M,8,8,2,2,C) -> (M,8,8,4C)
    xs_s2d = tuple(
        x.reshape(m, 8, 2, 8, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(m, 8, 8, 4 * c)
        for x, c in zip(xs, SEGS)
    )
    # kernel embedded into 2x2 x 4C phase layout: tap (i,j) of the 3x3
    # kernel reads input pixel 2u+i-1 = 2(u-1+((i+1)//2)) + (i+1)%2,
    # i.e. phase a=(i+1)%2, kernel offset ky=(i+1)//2 in the 2x2 window
    # over u-1..u  (SAME left-pad 1)
    def embed(k, c):
        k4 = jnp.zeros((2, 2, 2, 2, c, OUT), dt)  # (ky,kx,a,b,C,OUT)
        for i in range(3):
            a, ky = (i + 1) % 2, (i + 1) // 2
            for j in range(3):
                b, kx = (j + 1) % 2, (j + 1) // 2
                k4 = k4.at[ky, kx, a, b].set(k[i, j])
        return k4.reshape(2, 2, 4 * c, OUT)

    ks_s2d = tuple(embed(k, c) for k, c in zip(ks, SEGS))

    def f_current(xs):
        acc = None
        for x, k in zip(xs, ks):
            y = conv(x, k, 2, [(1, 1), (1, 1)]).astype(jnp.float32)
            acc = y if acc is None else acc + y
        return jnp.sum(acc) * 1e-12

    def f_s2d_pre(xs_phase):
        acc = None
        for x4, k4 in zip(xs_phase, ks_s2d):
            y = conv(x4, k4, 1, [(1, 0), (1, 0)]).astype(jnp.float32)
            acc = y if acc is None else acc + y
        return jnp.sum(acc) * 1e-12

    def f_s2d_inline(xs):
        xp = tuple(
            x.reshape(m, 8, 2, 8, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(m, 8, 8, 4 * c)
            for x, c in zip(xs, SEGS)
        )
        return f_s2d_pre(xp)

    def f_phase4(xs):
        acc = None
        for x, k, c in zip(xs, ks, SEGS):
            x4 = x.reshape(m, 8, 2, 8, 2, c)
            # phases: a=row parity, b=col parity
            p = {
                (a, b): x4[:, :, a, :, b, :] for a in range(2) for b in range(2)
            }
            # taps i: a=(i+1)%2, ky=(i+1)//2 (window over u-1..u)
            # phase (1,1): taps i,j in {0,2} -> 2x2 kernel rows (ky,kx)
            k11 = jnp.stack(
                [jnp.stack([k[0, 0], k[0, 2]], 0), jnp.stack([k[2, 0], k[2, 2]], 0)],
                0,
            )  # (2,2,C,OUT)
            k10 = jnp.stack([k[0, 1], k[2, 1]], 0)[:, None]  # (2,1,C,OUT)
            k01 = jnp.stack([k[1, 0], k[1, 2]], 0)[None]  # (1,2,C,OUT)
            k00 = k[1, 1][None, None]
            y = (
                conv(p[(1, 1)], k11, 1, [(1, 0), (1, 0)])
                + conv(p[(1, 0)], k10, 1, [(1, 0), (0, 0)])
                + conv(p[(0, 1)], k01, 1, [(0, 0), (1, 0)])
                + conv(p[(0, 0)], k00, 1, [(0, 0), (0, 0)])
            ).astype(jnp.float32)
            acc = y if acc is None else acc + y
        return jnp.sum(acc) * 1e-12

    # pre-split phase tensors: (a, b) -> tuple over segments of (M,8,8,C)
    xs_phase = tuple(
        tuple(
            x.reshape(m, 8, 2, 8, 2, c)[:, :, a, :, b, :]
            for x, c in zip(xs, SEGS)
        )
        for a in range(2)
        for b in range(2)
    )  # index (a*2+b)

    def _phase_kernels(k):
        k11 = jnp.stack(
            [jnp.stack([k[0, 0], k[0, 2]], 0), jnp.stack([k[2, 0], k[2, 2]], 0)],
            0,
        )
        k10 = jnp.stack([k[0, 1], k[2, 1]], 0)[:, None]
        k01 = jnp.stack([k[1, 0], k[1, 2]], 0)[None]
        k00 = k[1, 1][None, None]
        return k00, k01, k10, k11

    def f_phase4_presplit(xsp):
        acc = None
        for si, k in enumerate(ks):
            k00, k01, k10, k11 = _phase_kernels(k)
            y = (
                conv(xsp[3][si], k11, 1, [(1, 0), (1, 0)])
                + conv(xsp[2][si], k10, 1, [(1, 0), (0, 0)])
                + conv(xsp[1][si], k01, 1, [(0, 0), (1, 0)])
                + conv(xsp[0][si], k00, 1, [(0, 0), (0, 0)])
            ).astype(jnp.float32)
            acc = y if acc is None else acc + y
        return jnp.sum(acc) * 1e-12

    def f_current_paired(xs):
        # concat f1/f2 per level -> 4 fatter convs
        acc = None
        for i in range(4):
            x = jnp.concatenate([xs[i], xs[i + 4]], axis=-1)
            k = jnp.concatenate([ks[i], ks[i + 4]], axis=2)
            y = conv(x, k, 2, [(1, 1), (1, 1)]).astype(jnp.float32)
            acc = y if acc is None else acc + y
        return jnp.sum(acc) * 1e-12

    flops = 2 * m * 64 * 9 * sum(SEGS) * OUT
    for name, fn, inp in [
        ("current (8x s2 conv)", f_current, xs),
        ("paired (4x s2 conv)", f_current_paired, xs),
        ("s2d inline transpose", f_s2d_inline, xs),
        ("s2d pre-transposed", f_s2d_pre, xs_s2d),
        ("phase4 decomposed", f_phase4, xs),
        ("phase4 pre-split", f_phase4_presplit, xs_phase),
    ]:
        run = loopify(fn)
        t = marginal(run, inp)
        eff_flops = flops * (16 / 9 if "s2d" in name else 1)
        print(
            f"{name:24s} {t * 1e3:7.2f} ms   {flops / t / 1e12:6.1f} TF/s useful"
            f"  ({eff_flops / t / 1e12:6.1f} TF/s issued)"
        )

    # sanity: all formulations agree
    a = f_current(xs)
    for nm, v in [
        ("paired", f_current_paired(xs)),
        ("s2d", f_s2d_pre(xs_s2d)),
        ("phase4", f_phase4(xs)),
        ("phase4p", f_phase4_presplit(xs_phase)),
    ]:
        d = abs(float(a) - float(v)) / max(1e-9, abs(float(a)))
        print(f"rel-agree {nm}: {d:.2e}")


if __name__ == "__main__":
    main()
