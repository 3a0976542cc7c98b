"""Where does the tap-sum kernel's input relayout come from?

Round-4 trace attribution: the Pallas tap-sum kernel costs 2x1.0 ms
per change_stride iteration but its INPUT PREP costs more — a relayout
copy (2x1.5 ms) between the fold-out conv's CNHW output and the
``(9, N, h2*w2)`` standard-layout operand Mosaic requires. This tool
compiles the current ``conv4d_fold_out`` at change_stride eval scale,
prints every copy/transpose/bitcast in the optimized HLO with operand
shapes, and times the stage (conv only / conv + reshape / full).

Usage: python tools/profile_tapsum_relayout.py
"""

from __future__ import annotations

import functools
import os
import re
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def marginal(fn, x, lo=2, hi=8):
    @functools.partial(jax.jit, static_argnums=1)
    def run(x, iters):
        def body(i, carry):
            x, acc = carry
            s = fn(x)
            bump = (s * 1e-20).astype(x.dtype)
            return x + bump, acc + s.astype(jnp.float32)

        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return acc

    def timed(iters):
        float(run(x, iters))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, iters))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(hi) - timed(lo)) / (hi - lo)


def main():
    from patch2pix_tpu.ops.conv4d import conv4d_fold_out

    k = 3
    bs, h1, w1, h2, w2, cin = 2, 48, 64, 48, 64, 16
    cout = 1
    x = jax.random.normal(
        jax.random.PRNGKey(0), (bs, h1, w1, h2, w2, cin)
    ).astype(jnp.bfloat16)
    w = (
        jax.random.normal(jax.random.PRNGKey(1), (k, k, k, k, cin, cout))
        * 0.05
    ).astype(jnp.bfloat16)
    b = jnp.zeros((cout,), jnp.float32)

    def full(x):
        out = conv4d_fold_out(x, w, b, out_dtype=jnp.bfloat16)
        return jnp.sum(out[..., 0, ::5, 0].astype(jnp.float32)) * 1e-9

    t = marginal(full, x)
    print(f"conv4d_fold_out full: {t * 1e3:8.3f} ms")

    hlo = jax.jit(full).lower(x).compile().as_text()
    pat = re.compile(
        r"^\s*(\S+)\s*=\s*(\S+)\s+(copy|transpose|bitcast)\(", re.M
    )
    print("-- copy/transpose ops in optimized HLO --")
    for m in pat.finditer(hlo):
        print(f"  {m.group(3):10s} -> {m.group(2)}")
    # fusions that contain a transpose
    for m in re.finditer(r"^\s*%?fused_computation[^\n]*", hlo, re.M):
        pass
    # big picture: count bytes of copy ops
    print("-- conv custom-calls --")
    for m in re.finditer(r"= (\S+) custom-call\(([^)]*)\)[^\n]*", hlo):
        line = m.group(0)
        if "conv" in line:
            print(" ", line[:160])


if __name__ == "__main__":
    main()
