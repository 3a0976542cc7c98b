"""Prototype: tap-sum kernel v2 operating in the conv's NATIVE layout.

The fold-out conv's CNHW output is physically N-minor
(``bf16[9,Np,HW]{1,0,2}``); the current tap-sum kernel wants the
standard HW-minor layout, costing a 347 MB relayout copy per symmetric
branch (see tools/profile_tapsum_relayout.py). v2 consumes the
TRANSPOSED logical view ``(9, HW, Np)`` — a free bitcast — and does the
masked shift-add along the LANE dim with ``pltpu.roll``; only the
1-channel output (75 MB f32) is transposed back.

Also probes the conv INPUT side: the conv wants N-minor input too
(604 MB copy of the 16-channel volume); measures conv variants with
pre-transposed inputs / input specs.

Usage: python tools/try_tapsum_v2.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 3


def marginal(fn, *args, lo=2, hi=8):
    @functools.partial(jax.jit, static_argnums=1)
    def run(x, iters):
        def body(i, carry):
            x, acc = carry
            s = fn(x)
            bump = (s * 1e-20).astype(x.dtype)
            return x + bump, acc + s.astype(jnp.float32)

        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return acc

    x = args[0]

    def timed(iters):
        float(run(x, iters))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, iters))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(hi) - timed(lo)) / (hi - lo)


def tap_sum_v2(zt, bias, bs, h1, w1, p_left, hb=32, interpret=False):
    """zt (9, HW, Np) lane-major-N -> (HW, N) f32 masked shift-add.

    Np = p_left + N + p_right with Np % 128 == 0, p_right >= p_left,
    p_left = pad*w1 + pad.
    """
    t9, hw, np_ = zt.shape
    n = bs * h1 * w1
    pad = K // 2
    taps = [
        (di, dj, (di - pad) * w1 + (dj - pad))
        for di in range(K)
        for dj in range(K)
    ]

    def kernel(z_ref, bias_ref, o_ref):
        f = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        row = (f // w1) % h1
        col = f % w1
        acc = jnp.zeros((hb, n), jnp.float32)
        for t, (di, dj, s) in enumerate(taps):
            # Mosaic: rotate is 32-bit only — upcast the tap row first
            v = pltpu.roll(
                z_ref[t].astype(jnp.float32), np_ - (p_left + s), axis=1
            )[:, :n]
            ok = (
                (row + (di - 1) >= 0) & (row + (di - 1) < h1)
                & (col + (dj - 1) >= 0) & (col + (dj - 1) < w1)
            ).astype(jnp.float32)
            acc = acc + v * ok
        o_ref[...] = acc + bias_ref[0]

    return pl.pallas_call(
        kernel,
        grid=(hw // hb,),
        in_specs=[
            pl.BlockSpec((t9, hb, np_), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((hb, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hw, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(zt, bias.astype(jnp.float32).reshape(1))


def main():
    bs, h1, w1, h2, w2, cin = 2, 48, 64, 48, 64, 16
    cout = 1
    n = bs * h1 * w1
    hw = h2 * w2
    pad = K // 2
    p = pad * w1 + pad
    p_right = (-(n + p)) % 128
    while p_right < p:
        p_right += 128
    np_ = n + p + p_right
    print(f"n={n} hw={hw} p={p} p_right={p_right} Np={np_}")

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (np_, h2, w2, cin)).astype(jnp.bfloat16)
    # zero the pad rows like the prepad would (values there are masked
    # anyway, but keep the reference comparison clean)
    x = x.at[:p].set(0).at[p + n:].set(0)
    w = (jax.random.normal(jax.random.PRNGKey(1), (K, K, cin, K * K * cout))
         * 0.05).astype(jnp.bfloat16)
    bias = jnp.float32(0.1)

    def conv_cnhw(x):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "CNHW"),
        ).astype(jnp.bfloat16)

    # ---- correctness: v2 vs the existing kernel path
    from patch2pix_tpu.ops.tap_sum_pallas import tap_sum_pallas

    z = conv_cnhw(x)  # (9, Np, h2, w2)
    # existing kernel consumes (9, N + 2p + 8, HW): build by slicing the
    # prepad convention (p, p + 8)
    z_cur = z.reshape(K * K, np_, hw)[:, : n + 2 * p + 8]
    ref = tap_sum_pallas(z_cur, bias, bs, h1, w1, prepadded=True)

    zt = jnp.transpose(z.reshape(K * K, np_, hw), (0, 2, 1))
    out_t = tap_sum_v2(zt, bias, bs, h1, w1, p)
    got = jnp.transpose(out_t, (1, 0))
    err = jnp.max(jnp.abs(got - ref))
    print(f"v2 vs current max abs err: {float(err):.3e}")

    # ---- timing
    def full_current(x):
        z = conv_cnhw(x).reshape(K * K, np_, hw)[:, : n + 2 * p + 8]
        o = tap_sum_pallas(z, bias, bs, h1, w1, prepadded=True)
        return jnp.sum(o[::7, ::9]) * 1e-9

    def full_v2(x):
        z = conv_cnhw(x).reshape(K * K, np_, hw)
        zt = jnp.transpose(z, (0, 2, 1))
        ot = tap_sum_v2(zt, bias, bs, h1, w1, p)
        o = jnp.transpose(ot, (1, 0))
        return jnp.sum(o[::7, ::9]) * 1e-9

    def full_v2_notranspose(x):
        z = conv_cnhw(x).reshape(K * K, np_, hw)
        zt = jnp.transpose(z, (0, 2, 1))
        ot = tap_sum_v2(zt, bias, bs, h1, w1, p)
        return jnp.sum(ot[::9, ::7]) * 1e-9

    def conv_only(x):
        z = conv_cnhw(x)
        return jnp.sum(z[..., ::7, 0].astype(jnp.float32)) * 1e-9

    for name, fn in [
        ("conv only (CNHW)", conv_only),
        ("conv + current kernel", full_current),
        ("conv + v2 + out transpose", full_v2),
        ("conv + v2 (transposed out)", full_v2_notranspose),
    ]:
        t = marginal(fn, x)
        print(f"{name:32s} {t * 1e3:8.3f} ms")

    # ---- input side: does a CNHW INPUT spec avoid the 604 MB copy?
    xt = jnp.transpose(x, (3, 0, 1, 2))  # (cin, Np, h2, w2)

    def conv_cnhw_in(xt):
        z = jax.lax.conv_general_dilated(
            xt, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("CNHW", "HWIO", "CNHW"),
        ).astype(jnp.bfloat16)
        return jnp.sum(z[..., ::7, 0].astype(jnp.float32)) * 1e-9

    t = marginal(conv_cnhw_in, xt)
    print(f"{'conv only (CNHW in+out)':32s} {t * 1e3:8.3f} ms")

    import re
    hlo = jax.jit(conv_only).lower(x).compile().as_text()
    copies = re.findall(r"copy\(", hlo)
    print(f"conv_only NHWC-in copies in HLO: {len(copies)}")
    hlo2 = jax.jit(conv_cnhw_in).lower(xt).compile().as_text()
    print(f"conv CNHW-in copies in HLO: {len(re.findall(r'copy[(]', hlo2))}")


if __name__ == "__main__":
    main()
