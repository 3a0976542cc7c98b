"""Regressor conv0 formulations at change_stride eval scale.

The trace shows conv0 (the stride-2 SegmentedConv over the per-level
patch slices) at 8.14 ms/stage (~90 TF/s): 8 small segment convs
(4 levels x 2 images). Candidates, all exact reassociations of the
same contraction:

  a. current: 8 segment convs, f32 accumulate
  b. per-level f1||f2 channel concat (bf16): 4 convs, doubled K
  c. full hypercolumn concat (bf16): 1 conv, K = 9*1036
     (the round-2 split-conv change removed the F32 concat; in bf16
     the concat costs half and the single conv has the best MXU shape)

Usage: python tools/profile_regressor.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

M = 2400  # B * fine_cap at change_stride
PS = 16
DIMS = (3, 64, 64, 128)  # per-level channels (image, conv1, layer1, layer2)
COUT = 512
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


def conv(x, k, stride=2):
    # mirrors SegmentedConv: operand-dtype output, explicit f32 upcast
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)


def main():
    key = jax.random.PRNGKey(0)
    levels = []
    for i, c in enumerate(DIMS):
        levels.append(jax.random.normal(
            jax.random.PRNGKey(i), (M, PS, PS, c), jnp.bfloat16))
    # two images' patches (8 segments total)
    segs = levels + [lv + 1 for lv in levels]
    kers = [
        jax.random.normal(jax.random.PRNGKey(10 + i), (3, 3, s.shape[-1], COUT),
                          jnp.bfloat16) * 0.02
        for i, s in enumerate(segs)
    ]

    def a_current(x0, i):
        acc = None
        segs2 = [x0] + segs[1:]
        for s, k in zip(segs2, kers):
            y = conv(s, k)
            acc = y if acc is None else acc + y
        return jnp.sum(acc.astype(jnp.float32)) * 1e-9

    t = marginal(loopify(a_current), segs[0])
    print(f"{'a. 8 segment convs':34s} {t * 1e3:8.2f} ms")

    def b_paired(x0, i):
        acc = None
        segs2 = [x0] + segs[1:]
        for li in range(4):
            s = jnp.concatenate([segs2[li], segs2[4 + li]], axis=-1)
            k = jnp.concatenate([kers[li], kers[4 + li]], axis=2)
            y = conv(s, k)
            acc = y if acc is None else acc + y
        return jnp.sum(acc.astype(jnp.float32)) * 1e-9

    t = marginal(loopify(b_paired), segs[0])
    print(f"{'b. 4 paired-level convs':34s} {t * 1e3:8.2f} ms")

    def c_full(x0, i):
        segs2 = [x0] + segs[1:]
        s = jnp.concatenate(segs2, axis=-1)
        k = jnp.concatenate(kers, axis=2)
        y = conv(s, k)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    t = marginal(loopify(c_full), segs[0])
    print(f"{'c. full bf16 concat conv':34s} {t * 1e3:8.2f} ms")

    import numpy as np
    a = jax.jit(lambda: sum(conv(s, k) for s, k in zip(segs, kers)))()
    b = jax.jit(lambda: sum(
        conv(jnp.concatenate([segs[li], segs[4 + li]], -1),
             jnp.concatenate([kers[li], kers[4 + li]], 2))
        for li in range(4)
    ))()
    c = jax.jit(lambda: conv(
        jnp.concatenate(segs, -1), jnp.concatenate(kers, 2)
    ))()
    print("b vs a max diff:", float(jnp.abs(b - a).max()))
    print("c vs a max diff:", float(jnp.abs(c - a).max()))
    assert np.isfinite(float(jnp.sum(a)))


if __name__ == "__main__":
    main()
