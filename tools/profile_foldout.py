"""Breakdown of conv4d_fold_out's cost at change_stride scale.

Variants: z output layout (CNHW feature-major vs NHWC) x z dtype
(f32 vs bf16), plus the inner conv and the shift-add timed separately.

Usage: python tools/profile_foldout.py
"""

from __future__ import annotations

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


def main():
    from patch2pix_tpu.ops.conv4d import _outer_shift

    bs, h1, w1, h2, w2, cin = 2, 48, 64, 48, 64, 16
    k = 3
    cout = 1
    y = jax.random.normal(
        jax.random.PRNGKey(0), (bs, h1, w1, h2, w2, cin), jnp.float32
    ).astype(jnp.bfloat16)
    w = (jax.random.normal(
        jax.random.PRNGKey(1), (k, k, k, k, cin, cout)) * 0.05
    ).astype(jnp.bfloat16)
    vf = w.transpose(2, 3, 4, 0, 1, 5).reshape(k, k, cin, k * k * cout)

    def conv_only(x, i, spec, zdt):
        z = jax.lax.conv_general_dilated(
            x.reshape(bs * h1 * w1, h2, w2, cin), vf,
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", spec),
            preferred_element_type=jnp.float32,
        ).astype(zdt)
        return jnp.sum(z[..., ::7].astype(jnp.float32)) * 1e-9

    for spec in ("CNHW", "NHWC"):
        for zdt in (jnp.float32, jnp.bfloat16):
            t = marginal(loopify(
                functools.partial(conv_only, spec=spec, zdt=zdt)), y)
            print(f"conv only {spec} z={jnp.dtype(zdt).name:9s} {t*1e3:8.2f} ms")

    # shift-add from a feature-major z
    for zdt in (jnp.float32, jnp.bfloat16):
        z = jax.random.normal(
            jax.random.PRNGKey(2), (k * k, bs, h1, w1, h2, w2), jnp.float32
        ).astype(zdt)

        def shift_add(zz, i):
            out = None
            for t_ in range(k * k):
                di, dj = t_ // k, t_ % k
                s = _outer_shift(zz[t_][..., None], di, dj)[..., 0]
                s = s.astype(jnp.float32)
                out = s if out is None else out + s
            return jnp.sum(out) * 1e-9

        t = marginal(loopify(shift_add), z)
        print(f"shift-add  z={jnp.dtype(zdt).name:9s} {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
