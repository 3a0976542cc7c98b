"""Micro-profile of the NCN block's conv4d formulations at eval scale.

The change_stride trace shows the fold_out path costs as much in
layout copies + reshapes (~3.1 ms/branch) as in its convolutions
(2.2 ms/branch): XLA lays the CNHW conv output feature-major with the
position axis in lanes, then pays two full-volume relayout passes
before the tap shift-add. This times the whole symmetric NCN stack
and fold_out output-spec variants.

Usage: python tools/profile_ncn.py [--u16]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp

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


def fold_out_spec(x, w, b, out_spec: str):
    """conv4d_fold_out with a configurable conv output spec."""
    k = w.shape[0]
    bs, h1, w1, h2, w2, cin = x.shape
    cout = w.shape[-1]
    vf = w.transpose(2, 3, 4, 0, 1, 5).reshape(k, k, cin, k * k * cout)
    z = jax.lax.conv_general_dilated(
        x.reshape(bs * h1 * w1, h2, w2, cin),
        vf,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", out_spec),
        preferred_element_type=jnp.float32,
    )
    assert out_spec == "NCHW"
    z = z.astype(x.dtype)
    z = z.reshape(bs, h1, w1, k * k, cout, h2, w2)
    zp = jnp.pad(
        z, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0), (0, 0))
    )
    out = None
    for t in range(k * k):
        di, dj = t // k, t % k
        shifted = jax.lax.slice(
            zp, (0, di, dj, t, 0, 0, 0),
            (bs, di + h1, dj + w1, t + 1, cout, h2, w2),
        )[:, :, :, 0].astype(jnp.float32)
        shifted = jnp.moveaxis(shifted, 3, -1)  # (B,h1,w1,h2,w2,cout)
        out = shifted if out is None else out + shifted
    if b is not None:
        out = out + b
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--u16", action="store_true")
    args = ap.parse_args()

    side = 24 if args.u16 else 48
    w2s = 32 if args.u16 else 64
    bs = 2
    x = jax.random.normal(
        jax.random.PRNGKey(0), (bs, side, w2s, side, w2s, 16), jnp.bfloat16
    )
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 3, 16, 1), jnp.float32)
    b = jnp.zeros((1,), jnp.float32)

    from patch2pix_tpu.ops.conv4d import conv4d_fold_out

    def lib(xx, i):
        return jnp.sum(
            conv4d_fold_out(xx, w.astype(xx.dtype), b, out_dtype=jnp.bfloat16)
            .astype(jnp.float32)
        ) * 1e-9

    t = marginal(loopify(lib), x)
    print(f"{'library fold_out (CNHW)':30s} {t * 1e3:8.2f} ms")

    def nchw(xx, i):
        return jnp.sum(fold_out_spec(xx, w.astype(xx.dtype), b, "NCHW")
                       .astype(jnp.float32)) * 1e-9

    t = marginal(loopify(nchw), x)
    print(f"{'fold_out NCHW spec':30s} {t * 1e3:8.2f} ms")

    # exactness spot check
    import numpy as np
    a = np.asarray(conv4d_fold_out(x, w.astype(x.dtype), b))
    c = np.asarray(fold_out_spec(x, w.astype(x.dtype), b, "NCHW"))
    print("NCHW max diff vs library:", np.abs(a - c).max())


if __name__ == "__main__":
    main()
