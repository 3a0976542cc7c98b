"""BN batch-statistics formulations on the regressor's conv outputs.

The train-step profile attributes ~99 ms/step to convert+reduce
fusions over the bf16 (12800, 8, 8, 512) regressor conv outputs (BN
forward stats + backward reductions). The VPU lowering converts to
f32 elementwise and reduces — this sweep measures whether MXU
formulations (sums as ones-matmuls, sumsq as a gram-matrix diagonal)
beat it.

Usage: python tools/profile_bn_stats.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

M, C = 12800 * 64, 512  # flattened (N*H*W, C)


def timed(fn, x, iters_lo=3, iters_hi=13):
    @functools.partial(jax.jit, static_argnums=1)
    def loop(x, n):
        def body(i, carry):
            x, acc = carry
            mu, var = fn(x)
            return x + (mu[0] * 1e-12).astype(x.dtype), acc + var[0]

        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
        return acc

    def run(n):
        float(loop(x, n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(iters_hi) - run(iters_lo)) / (iters_hi - iters_lo) * 1e3


def stats_vpu(x):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=0)
    var = jnp.mean(jnp.square(xf), axis=0) - jnp.square(mu)
    return mu, var


def stats_matmul(x):
    # sums and sum-of-squares from ONE read of x: gram row of the
    # ones-augmented matrix. diag(X^T X) and 1^T X via two dots that
    # both stream x through the MXU.
    ones = jnp.ones((x.shape[0],), x.dtype)
    s = jax.lax.dot_general(
        ones[None, :], x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]
    sq = jax.lax.dot_general(
        x, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (C, C); the diagonal is sum(x^2)
    n = jnp.float32(x.shape[0])
    mu = s / n
    var = jnp.diagonal(sq) / n - jnp.square(mu)
    return mu, var


def stats_sq_matmul(x):
    # sumsq via an elementwise square + ones-matmul (avoids the CxC
    # gram); two reads of x but both MXU-streamed
    ones = jnp.ones((x.shape[0],), x.dtype)
    dot = lambda a: jax.lax.dot_general(
        ones[None, :], a, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]
    n = jnp.float32(x.shape[0])
    mu = dot(x) / n
    var = dot(x * x) / n - jnp.square(mu)
    return mu, var


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (M, C), jnp.bfloat16)
    for name, fn in (
        ("vpu convert+reduce (current)", stats_vpu),
        ("gram-diag matmul", stats_matmul),
        ("square + ones-matmul", stats_sq_matmul),
    ):
        ms = timed(fn, x)
        print(f"{name:32s} {ms:7.2f} ms")
    # numerical check
    mu0, var0 = stats_vpu(x)
    for name, fn in (("gram", stats_matmul), ("sq", stats_sq_matmul)):
        mu, var = fn(x)
        import numpy as np

        print(name, "max |dmu|", float(jnp.abs(mu - mu0).max()),
              "max |dvar|", float(jnp.abs(var - var0).max()))


if __name__ == "__main__":
    main()
