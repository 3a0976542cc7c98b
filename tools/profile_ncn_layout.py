"""Full NCN block: count/size the layout copies and time variants.

Round-4 attribution: the tap-sum kernel's input prep costs ~5 ms/iter
at change_stride scale. The HLO (tools/profile_tapsum_relayout.py)
shows TWO copy families inside ``NeighConsensus``:
  * per symmetric branch, the fold-out conv relayouts its 16-channel
    input volume to the conv's preferred N-minor layout (604 MB each);
  * per branch, the conv's N-minor CNHW output is copied back to the
    standard layout the tap-sum kernel wants (347 MB each).

Usage: python tools/profile_ncn_layout.py
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


def copy_report(hlo: str) -> str:
    tot = 0
    lines = []
    for m in re.finditer(
        r"=\s*((?:bf16|f32|s32|pred)\[[\d,]*\][^\s]*)\s+copy\(", hlo
    ):
        shape = m.group(1)
        dims = re.match(r"(bf16|f32|s32|pred)\[([\d,]*)\]", shape)
        if not dims:
            continue
        nums = [int(d) for d in dims.group(2).split(",") if d]
        b = 1
        for d in nums:
            b *= d
        b *= {"bf16": 2, "f32": 4, "s32": 4, "pred": 1}[dims.group(1)]
        tot += b
        if b > 1 << 20:
            lines.append(f"    {b / 1e6:8.1f} MB  {shape}")
    return f"  copies total {tot / 1e6:.1f} MB\n" + "\n".join(lines)


def main():
    from patch2pix_tpu.models.ncn import NeighConsensus

    bs, h1, w1, h2, w2 = 2, 48, 64, 48, 64
    ncn = NeighConsensus(dtype=jnp.bfloat16)
    x = jax.random.normal(
        jax.random.PRNGKey(0), (bs, h1, w1, h2, w2)
    ).astype(jnp.bfloat16)
    variables = ncn.init(jax.random.PRNGKey(1), x)

    def fwd(x):
        y = ncn.apply(variables, x)
        return jnp.sum(y[..., ::5].astype(jnp.float32)) * 1e-9

    t = marginal(fwd, x)
    print(f"NCN block: {t * 1e3:8.3f} ms")
    hlo = jax.jit(fwd).lower(x).compile().as_text()
    print(copy_report(hlo))


if __name__ == "__main__":
    main()
