"""Level-0 (image, C=3) patch-gather variants, measured on chip.

The fine-gather micro-profile shows the image level costs 6.7 ms of an
11.7 ms gather call — its 3-channel minor dim wastes 42x of every
vector op and gather. Variants benchmarked against the current
tiled-take formulation:

  a. current: (.., 32, 32, 3) superblock, transpose + 2 chained takes
  b. same, image pre-cast to bf16
  c. flat-x rows: y-take on (.., 32, 96) lanes, then x via a take of
     whole 48-wide windows using one combined flat take
  d. lax.gather of (1, 1, 48) slices straight from the padded image
  e. y-take on flat rows + static x windows selected by parity phase
     (dynamic_slice vmapped over proposals)

Usage: python tools/profile_l0.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

H, W = 768, 1024
BATCH = 2
N = 768
PSIZE = 16
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
    from patch2pix_tpu.ops.patch_gather import _gather_level_tiled

    im = jax.random.normal(jax.random.PRNGKey(0), (BATCH, H, W, 3), jnp.float32)
    pts = jax.random.uniform(
        jax.random.PRNGKey(9), (BATCH, N, 2), minval=8.0,
        maxval=float(min(H, W)) - 8.0,
    )
    x0 = pts[..., 0].astype(jnp.int32) - PSIZE // 2
    y0 = pts[..., 1].astype(jnp.int32) - PSIZE // 2

    def a_current(fm, i):
        out = _gather_level_tiled(fm, y0, x0, PSIZE, 1, PSIZE)
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    t = marginal(loopify(a_current), im)
    print(f"{'a. current tiled (f32)':34s} {t * 1e3:8.2f} ms")

    t = marginal(loopify(a_current), im.astype(jnp.bfloat16))
    print(f"{'b. current tiled (bf16)':34s} {t * 1e3:8.2f} ms")

    def c_flat(fm, i):
        b = BATCH
        # edge-pad one 16px ring so all indices are interior
        fp = jnp.pad(fm, ((0, 0), (16, 16), (16, 16), (0, 0)), mode="edge")
        hp, wp = H + 32, W + 32
        nty, ntx = hp // 16, wp // 16
        tiles = fp.reshape(b, nty, 16, ntx, 16 * 3)
        tiles = tiles.transpose(0, 1, 3, 2, 4).reshape(b, nty * ntx, 16 * 48)
        y0p = jnp.clip(y0 + 16, 0, H + 15)
        x0p = jnp.clip(x0 + 16, 0, W + 15)
        ky, kx = y0p // 16, x0p // 16
        dyx = jnp.asarray([[0, 0], [0, 1], [1, 0], [1, 1]], jnp.int32)
        lin = ((ky[..., None] + dyx[None, None, :, 0]) * ntx
               + (kx[..., None] + dyx[None, None, :, 1]))
        rows = jnp.take_along_axis(
            tiles, lin.reshape(b, N * 4, 1), axis=1
        ).reshape(b, N, 2, 2, 16, 48)
        # y-take: (ty, wy) adjacent per tx -> (32, 48) flat-x rows
        blk = rows.transpose(0, 1, 3, 2, 4, 5).reshape(b, N, 2, 32, 48)
        iy = (y0p % 16)[..., None] + jnp.arange(PSIZE)  # (B, N, 16) in [0,31)
        got = jnp.take_along_axis(
            blk, iy[:, :, None, :, None], axis=3
        )  # (B, N, 2, 16, 48)
        wide = got.transpose(0, 1, 3, 2, 4).reshape(b, N, PSIZE, 96)
        # x: one combined flat take of 48 contiguous lanes
        ix = (x0p % 16) * 3  # (B, N) start lane
        lanes = ix[..., None] + jnp.arange(48)  # (B, N, 48)
        out = jnp.take_along_axis(
            wide, lanes[:, :, None, :], axis=3
        )  # (B, N, 16, 48)
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    t = marginal(loopify(c_flat), im)
    print(f"{'c. flat-x rows + lane take (f32)':34s} {t * 1e3:8.2f} ms")

    def d_gather_slices(fm, i):
        b = BATCH
        fp = jnp.pad(fm, ((0, 0), (16, 16), (16, 16), (0, 0)), mode="edge")
        y0p = jnp.clip(y0 + 16, 0, H + 15)
        x0p = jnp.clip(x0 + 16, 0, W + 15)
        ys = (y0p[..., None] + jnp.arange(PSIZE)).reshape(b, N * PSIZE)
        xs = jnp.broadcast_to(x0p[..., None], (b, N, PSIZE)).reshape(b, N * PSIZE)
        idx = jnp.stack([ys, xs], axis=-1)  # (B, N*16, 2)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )
        out = jax.vmap(
            lambda f, ii: jax.lax.gather(
                f, ii, dnums, slice_sizes=(1, PSIZE, 3),
                mode=jax.lax.GatherScatterMode.CLIP,
            )
        )(fp, idx)  # (B, N*16, 16, 3)?? offset dims...
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    try:
        t = marginal(loopify(d_gather_slices), im)
        print(f"{'d. lax.gather row slices (f32)':34s} {t * 1e3:8.2f} ms")
    except Exception as e:  # noqa: BLE001
        print(f"d. lax.gather row slices failed: {type(e).__name__}")

    t = marginal(loopify(c_flat), im.astype(jnp.bfloat16))
    print(f"{'c. flat-x rows + lane take (bf16)':34s} {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
