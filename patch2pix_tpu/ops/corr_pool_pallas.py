"""Fused correlation + 4D max-pool Pallas kernel.

The reference computes the full pre-pool correlation volume and then
4D-max-pools it (/root/reference/networks/modules.py:11-53): at
change_stride scale (1024x768, stride-8 features) the pre-pool volume
is ``(B, 96, 128, 96, 128)`` — 1.2 GB of f32 that is written by the
correlation einsum and immediately re-read (and 75% discarded) by the
pool. Both passes are pure HBM bandwidth.

This kernel never materialises the pre-pool volume. For ksize=2,

    pooled[b, i1, j1, i2, j2] =
        max_{d1,e1,d2,e2} <feat1[b, 2*i1+d1, 2*j1+e1],
                           feat2[b, 2*i2+d2, 2*j2+e2]>

so splitting feat1 and feat2 into their 4 spatial parity shards turns
the pool into an ELEMENTWISE max of 16 plain matmuls — pooled rows are
``max_s (w1p, C) @ (C, nbp)`` with zero lane/sublane movement: the
relayout-free formulation Mosaic wants (each parity shard's flat
``(h2p*w2p)`` index IS the pooled volume's row-major (i2, j2) index).

Each grid program computes one (batch, pooled-h1-row) slab; the feat2
shard panels (a few MB) stay resident in VMEM across programs.

The within-window argmax offsets ("delta4d") are NOT produced — they
are a function of the features and are recomputed lazily for just the
few thousand selected cells by :func:`decode_delta_from_feats`
(k^4 * C dot products per cell — microseconds), replacing
``correlation.decode_delta_at``'s row-gathers from the 1.2 GB volume.

Differentiable via custom VJP (backward falls back to the einsum +
values-pool reference formulation, which only ever runs at the small
training resolution).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KSIZE = 2  # the only pooling factor the fused kernel supports

# Dispatch threshold: below this pre-pool-volume size the einsum +
# values-pool path wins (one big MXU contraction and a cheap 75 MB
# round-trip beat the kernel's 16 smaller matmuls — measured 32.6 vs
# 30.1 pairs/s at the upsample-16 eval scale), above it materialising
# the volume is the bottleneck (change_stride: 1.2 GB) and the fused
# kernel wins.
MIN_PREPOOL_BYTES = 256 << 20


def corr_pool_supported(
    feat1: jax.Array,
    feat2: jax.Array,
    ksize: int,
    min_prepool_bytes: int = MIN_PREPOOL_BYTES,
) -> bool:
    """Static dispatch guard for the fused kernel."""
    from patch2pix_tpu.ops.dispatch import pallas_allowed

    b, h1, w1, c = feat1.shape
    _, h2, w2, c2 = feat2.shape
    prepool_bytes = h1 * w1 * h2 * w2 * 4  # f32, per batch element
    return (
        pallas_allowed()
        and ksize == KSIZE
        and c == c2
        and c % 128 == 0
        and h1 % 2 == 0 and w1 % 2 == 0 and h2 % 2 == 0 and w2 % 2 == 0
        and prepool_bytes >= min_prepool_bytes
    )


def _kernel(f1_ref, f2t_ref, o_ref):
    """One (batch, pooled-h1-row-block) program.

    f1_ref:  (1, rb, 2, 2, w1p, C) — ``rb`` pooled rows' worth of h1
             row pairs, w1 split by column parity.
    f2t_ref: (1, 4, C, nbp) — feat2's parity shards, transposed for the
             MXU; identical block for every program in a batch element,
             so the pipeline fetches it once.
    o_ref:   (1, rb, w1p, nbp) f32.
    """
    rb, w1p, c = f1_ref.shape[1], f1_ref.shape[4], f1_ref.shape[5]
    nbp = f2t_ref.shape[3]
    acc = None
    for d1 in range(2):
        for e1 in range(2):
            # rows of the SAME parity across the rb pooled rows stack
            # into one (rb*w1p, C) LHS — leading-dim reshape only
            m = f1_ref[0, :, d1, e1].reshape(rb * w1p, c)
            for s in range(4):
                r = jnp.dot(
                    m, f2t_ref[0, s], preferred_element_type=jnp.float32
                )
                acc = r if acc is None else jnp.maximum(acc, r)
    o_ref[0] = acc.reshape(rb, w1p, nbp)


def _pick_rb(h1p: int, w1p: int, nbp: int, c: int) -> int:
    """Pooled-h1 rows per program: aim for >= 256 LHS rows per matmul
    (full MXU occupancy) while keeping the f32 accumulator + f1 block
    under a few MB of VMEM."""
    budget = 8 << 20
    for rb in range(h1p, 0, -1):
        rows = rb * w1p
        used = 2 * (rows * nbp * 4 + 4 * rb * w1p * c * 2)
        if h1p % rb == 0 and used <= budget and (rows <= 256 or rb == 1):
            return rb
    return 1


def _corr_pool_ref(feat1: jax.Array, feat2: jax.Array) -> jax.Array:
    """Reference formulation (einsum + values-only pool); also the VJP
    primal recomputed in the backward pass."""
    from patch2pix_tpu.ops.correlation import feat_correlation, maxpool4d_values

    return maxpool4d_values(feat_correlation(feat1, feat2), KSIZE)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def corr_pool_fused(
    feat1: jax.Array, feat2: jax.Array, interpret: bool = False
) -> jax.Array:
    """maxpool4d_values(feat_correlation(feat1, feat2), 2), fused.

    Args:
      feat1: ``(B, h1, w1, C)`` channels-last (L2-normalised) features.
      feat2: ``(B, h2, w2, C)``; all spatial dims even, C % 128 == 0.

    Returns:
      ``(B, h1/2, w1/2, h2/2, w2/2)`` float32 pooled correlation volume,
      numerically identical to the unfused path (max of the same f32
      MXU dot products).
    """
    return _corr_pool_impl(feat1, feat2, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _corr_pool_impl(feat1, feat2, interpret=False):
    b, h1, w1, c = feat1.shape
    _, h2, w2, _ = feat2.shape
    h1p, w1p, h2p, w2p = h1 // 2, w1 // 2, h2 // 2, w2 // 2
    nbp = h2p * w2p
    rb = _pick_rb(h1p, w1p, nbp, c)
    # (B, h1p, d1, e1, w1p, C): row pairs with w1 column parity split
    f1 = feat1.reshape(b, h1p, 2, w1p, 2, c).transpose(0, 1, 2, 4, 3, 5)
    # (B, shard=(d2*2+e2), C, nbp): feat2 parity shards, MXU-transposed
    f2t = feat2.reshape(b, h2p, 2, w2p, 2, c).transpose(0, 2, 4, 5, 1, 3)
    f2t = f2t.reshape(b, 4, c, nbp)
    out = pl.pallas_call(
        _kernel,
        grid=(b, h1p // rb),
        in_specs=[
            pl.BlockSpec(
                (1, rb, 2, 2, w1p, c), lambda bb, i: (bb, i, 0, 0, 0, 0)
            ),
            pl.BlockSpec((1, 4, c, nbp), lambda bb, i: (bb, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb, w1p, nbp), lambda bb, i: (bb, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h1p, w1p, nbp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(f1, f2t)
    return out.reshape(b, h1p, w1p, h2p, w2p)


def _corr_pool_fwd(feat1, feat2, interpret):
    return _corr_pool_impl(feat1, feat2, interpret), (feat1, feat2)


def _corr_pool_bwd(interpret, res, g):
    feat1, feat2 = res
    _, vjp = jax.vjp(_corr_pool_ref, feat1, feat2)
    return vjp(g)


corr_pool_fused.defvjp(_corr_pool_fwd, _corr_pool_bwd)


def decode_delta_from_feats(
    feat1: jax.Array,
    feat2: jax.Array,
    ia: jax.Array, ja: jax.Array, ib: jax.Array, jb: jax.Array,
    ksize: int,
) -> tuple:
    """Within-window argmax offsets for SELECTED pooled cells, by
    recomputing the k^4 window correlations from the features.

    feat1/feat2: the SAME (L2-normalised) features the fused kernel saw.
    ia/ja/ib/jb: ``(B, N)`` pooled-grid indices. Returns
    (di, dj, dk, dl) int32 ``(B, N)`` with the first-max tie-break on
    the row-major (di, dj, dk, dl) window order — the ordering of
    ``correlation.maxpool4d`` and the reference's slice loop.
    """
    k = ksize
    b, h1, w1, c = feat1.shape
    _, h2, w2, _ = feat2.shape
    n = ia.shape[1]
    dd, ee = jnp.meshgrid(jnp.arange(k), jnp.arange(k), indexing="ij")
    dd, ee = dd.ravel(), ee.ravel()  # (k^2,) row-major (d, e)

    def window_rows(feat, ii, jj, w):
        rows = feat.reshape(b, -1, c)
        idx = (ii * k)[..., None] * w + (jj * k)[..., None] + dd * w + ee
        got = jnp.take_along_axis(
            rows, idx.reshape(b, n * k * k, 1), axis=1
        )
        return got.reshape(b, n, k * k, c)

    p1 = window_rows(feat1, ia, ja, w1)  # (B, N, k^2, C)
    p2 = window_rows(feat2, ib, jb, w2)
    # vals[b, n, s1, s2] = <p1[s1], p2[s2]>, accumulated in f32 on the
    # VPU (k^2 x k^2 matmuls are too skinny for the MXU)
    vals = jnp.sum(
        p1[:, :, :, None, :].astype(jnp.float32)
        * p2[:, :, None, :, :].astype(jnp.float32),
        axis=-1,
    ).reshape(b, n, k**4)  # row-major (di, dj, dk, dl)
    arg = jnp.argmax(vals, axis=-1).astype(jnp.int32)  # first max wins
    return (arg // (k**3), (arg // (k**2)) % k, (arg // k) % k, arg % k)
