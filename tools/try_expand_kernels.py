"""Experiment: Mosaic-compatible formulations of the fused patch
expansion kernel (ops/patch_expand_pallas.py).

Findings so far (real v5e chip, this environment's remote compiler):
  - v1's interleaving ``transpose(0,1,3,2,4).reshape`` fails Mosaic
    ("unsupported shape cast").
  - Lane-broadcasting a BF16 value derived from int32 compares crashes
    the compiler (opaque HTTP 500); the same mask math in F32 works.
  - Lane slices ``w*c:(w+1)*c`` compile for c in {64,128} but crash
    for c=3 (level 0) — arbitrary-offset lane slicing is unsupported.

Variants here (rows PRE-INTERLEAVED by XLA so no in-kernel transpose):
  loops3d : rows (M,2t,2t*c); Y + X mask-accumulate, f32 masks,
            X via static lane slices (requires c lane-sliceable).
  loops4d : rows (M,2t,2t,c); both selections index SUBLANE dims
            statically — no lane slicing at all (works for any c).
  mmY3d   : Y via one-hot f32 matmul (MXU), X mask-accumulate.

Timing: in-jit fori_loop marginal (the relay adds ~30 ms/call).

Usage: python tools/try_expand_kernels.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PSIZE = 16
BN = 8
LEVELS = ((16, 3), (8, 64), (4, 64), (2, 128))
M = 2048


def win(base, psize, ds):
    d = jax.lax.broadcasted_iota(jnp.int32, (1, psize), 1)
    return (base + d) // ds - (base // psize) * (psize // ds)


def expand_loops3d(r, iy, ix, psize, t, c):
    yw = None
    for ry in range(2 * t):
        mask = (iy == ry).astype(jnp.float32)
        term = mask[:, :, None] * r[:, ry][:, None, :].astype(jnp.float32)
        yw = term if yw is None else yw + term
    out = None
    for w in range(2 * t):
        mask = (ix == w).astype(jnp.float32)
        blk = yw[:, :, w * c:(w + 1) * c]
        term = mask[:, None, :, None] * blk[:, :, None, :]
        out = term if out is None else out + term
    return out.astype(r.dtype)


def expand_loops4d(r4, iy, ix, psize, t, c):
    # r4: (BN, 2t, 2t, c); Y then X, both static sublane-dim indexing
    yw = None
    for ry in range(2 * t):
        mask = (iy == ry).astype(jnp.float32)  # (BN, psize)
        term = mask[:, :, None, None] * r4[:, ry][:, None].astype(jnp.float32)
        yw = term if yw is None else yw + term  # (BN, psize, 2t, c)
    out = None
    for w in range(2 * t):
        mask = (ix == w).astype(jnp.float32)  # (BN, psize)
        blk = yw[:, :, w]  # (BN, psize, c)
        term = mask[:, None, :, None] * blk[:, :, None, :]
        out = term if out is None else out + term
    return out.astype(r4.dtype)


def expand_mmY3d(r, iy, ix, psize, t, c):
    sy = (iy[:, :, None] ==
          jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * t), 2)
          ).astype(jnp.float32)
    yw = jax.lax.dot_general(
        sy, r.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out = None
    for w in range(2 * t):
        mask = (ix == w).astype(jnp.float32)
        blk = yw[:, :, w * c:(w + 1) * c]
        term = mask[:, None, :, None] * blk[:, :, None, :]
        out = term if out is None else out + term
    return out.astype(r.dtype)


def build(variant, t, c, m, dtype=jnp.bfloat16):
    psize = PSIZE
    ds = psize // t
    four_d = variant == "loops4d"
    expand = {"loops3d": expand_loops3d, "loops4d": expand_loops4d,
              "mmY3d": expand_mmY3d}[variant]

    def kernel(y_ref, x_ref, r_ref, o_ref):
        iy = win(y_ref[:], psize, ds)
        ix = win(x_ref[:], psize, ds)
        o_ref[:] = expand(r_ref[:], iy, ix, psize, t, c)

    if four_d:
        row_spec = pl.BlockSpec((BN, 2 * t, 2 * t, c),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        row_shape = (m, 2 * t, 2 * t, c)
    else:
        row_spec = pl.BlockSpec((BN, 2 * t, 2 * t * c),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        row_shape = (m, 2 * t, 2 * t * c)

    f = pl.pallas_call(
        kernel, grid=(m // BN,),
        in_specs=[pl.BlockSpec((BN, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2 + [row_spec],
        out_specs=pl.BlockSpec((BN, psize, psize, c),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, psize, psize, c), dtype))
    return f, row_shape


def ref_expand(rows, y0, x0, psize, t, c, m):
    ds = psize // t
    iy, ix = win(y0, psize, ds), win(x0, psize, ds)
    sy = (iy[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 2 * t), 2)).astype(rows.dtype)
    yw = jax.lax.dot_general(
        sy, rows, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).astype(rows.dtype)
    ywr = yw.reshape(m, psize, 2 * t, c)
    sx = (ix[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 2 * t), 2)).astype(rows.dtype)
    out = jax.lax.dot_general(
        sx, ywr, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).astype(rows.dtype)
    return out.transpose(0, 2, 1, 3)


def marginal_time(fn, args, lo=2, hi=10):
    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(args, iters):
        def body(i, carry):
            a, acc = carry
            o = fn(*a)
            bump = (jnp.sum(o).astype(jnp.float32) * 1e-20)
            a = (a[0], a[1], a[2] + bump.astype(a[2].dtype))
            return a, acc + jnp.sum(o).astype(jnp.float32)
        _, acc = jax.lax.fori_loop(0, iters, body, (args, jnp.float32(0)))
        return acc

    def timed(iters):
        float(loop(args, iters))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(args, iters))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(hi) - timed(lo)) / (hi - lo)


def run(variant, t, c, m=M, dtype=jnp.bfloat16):
    psize = PSIZE
    ds = psize // t
    key = jax.random.PRNGKey(0)
    rows3 = jax.random.normal(key, (m, 2 * t, 2 * t * c), dtype)
    y0 = jax.random.randint(jax.random.fold_in(key, 1), (m, 1), 0,
                            8 * psize, jnp.int32) * ds
    x0 = jax.random.randint(jax.random.fold_in(key, 2), (m, 1), 0,
                            8 * psize, jnp.int32) * ds
    f, row_shape = build(variant, t, c, m, dtype)
    rows = rows3.reshape(row_shape)
    try:
        got = jax.block_until_ready(jax.jit(f)(y0, x0, rows))
    except Exception as e:  # noqa: BLE001
        print(f"  {variant:8s} t={t:2d} c={c:3d}: COMPILE FAIL "
              f"{str(e).splitlines()[0][:60]}")
        return
    want = jax.jit(functools.partial(
        ref_expand, psize=psize, t=t, c=c, m=m))(rows3, y0, x0)
    exact = np.array_equal(np.asarray(got, np.float32),
                           np.asarray(want, np.float32))
    dt = marginal_time(f, (y0, x0, rows))
    gb = (rows.nbytes + got.nbytes) / 1e9
    print(f"  {variant:8s} t={t:2d} c={c:3d}: exact={exact} "
          f"{dt*1e3:7.3f} ms ({gb/dt:6.1f} GB/s)")


def main():
    print(f"backend={jax.default_backend()} m={M}")
    for variant in ("loops4d", "loops3d", "mmY3d"):
        for t, c in LEVELS:
            run(variant, t, c)


if __name__ == "__main__":
    main()
