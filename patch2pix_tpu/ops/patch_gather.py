"""Hypercolumn local-patch gathering around match endpoints.

Capability parity with ``select_local_patch_feats``
(/root/reference/networks/utils.py:4-36), re-designed batched and
gather-efficient:

  * the reference (and the naive port, kept as
    :func:`gather_local_patches_ref`) gathers psize*psize individual
    pixels per pyramid level — ~1000 scattered one-element rows per
    proposal, the dominant inference cost on TPU,
  * the fast path instead slices ONE contiguous (bs, bs, C) block per
    proposal per level via ``vmap(dynamic_slice)`` (bs = the span of
    unique level cells a patch touches: 16/9/5/3/2 for strides
    1/2/4/8/16) and expands it to the psize x psize sampling pattern
    with tiny within-block ``take`` ops. Border clamping is EXACTLY
    the reference's per-pixel edge replication: the clamped pixel
    index always lands inside the clamped block window, so the
    within-block index reproduces it bit-for-bit,
  * channels-last output ``(B, N, psize, psize, D)`` feeding the
    regressor's NHWC convs directly; L2 normalisation over the
    hypercolumn dim (f32 accumulation).
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from patch2pix_tpu.ops.correlation import l2_normalize


def _patch_offsets(psize: int, ptype: str) -> Tuple[jax.Array, jax.Array]:
    """Row-major (dy, dx) offsets for a psize x psize patch."""
    dy, dx = jnp.meshgrid(jnp.arange(psize), jnp.arange(psize), indexing="ij")
    dy = dy.reshape(-1)
    dx = dx.reshape(-1)
    if ptype == "center":
        shift = psize // 2
        dy = dy - shift
        dx = dx - shift
    return dy, dx


def _level_downsamples(feat_idx, feats_downsample):
    """Cumulative downsample factor of every pyramid level."""
    out = []
    ds = 1
    for j in range(len(feats_downsample)):
        ds_j = ds * feats_downsample[j] if j > 0 else feats_downsample[0]
        ds = ds_j
        out.append(ds_j)
    return out


def _gather_level_blocks(
    fmap: jax.Array, y_base: jax.Array, x_base: jax.Array, psize: int, ds: int
) -> jax.Array:
    """Fast per-level patch sampling via block slices + expansion.

    fmap: (B, H, W, C) level features (stride ``ds`` wrt input pixels).
    y_base, x_base: (B, N) int32 patch top-left corners in INPUT-pixel
    coordinates. Returns (B, N, psize, psize, C) sampled exactly like
    the reference's per-pixel ``clip((base+d)//ds, 0, dim-1)``.
    """
    b, h, w, c = fmap.shape
    # span of unique level cells a psize-pixel patch can touch
    bs = psize if ds == 1 else (psize - 1) // ds + 2
    bs_y = min(bs, h)
    bs_x = min(bs, w)

    blk_y = jnp.clip(y_base // ds, 0, h - bs_y)  # (B, N) block starts
    blk_x = jnp.clip(x_base // ds, 0, w - bs_x)

    def slice_one(fm, y0, x0):
        return jax.lax.dynamic_slice(fm, (y0, x0, 0), (bs_y, bs_x, c))

    blocks = jax.vmap(  # over batch
        jax.vmap(slice_one, in_axes=(None, 0, 0))
    )(fmap, blk_y, blk_x)  # (B, N, bs_y, bs_x, C)

    # within-block indices reproducing clip((base+d)//ds, 0, dim-1)
    d = jnp.arange(psize)  # (psize,)
    iy = jnp.clip((y_base[..., None] + d) // ds, 0, h - 1) - blk_y[..., None]
    ix = jnp.clip((x_base[..., None] + d) // ds, 0, w - 1) - blk_x[..., None]
    iy = jnp.clip(iy, 0, bs_y - 1)  # (B, N, psize)
    ix = jnp.clip(ix, 0, bs_x - 1)

    out = jnp.take_along_axis(blocks, iy[..., None, None], axis=2)
    out = jnp.take_along_axis(out, ix[:, :, None, :, None], axis=3)
    return out  # (B, N, psize, psize, C)


def gather_local_patches(
    feats: Sequence[jax.Array],
    points: jax.Array,
    feat_idx: Sequence[int],
    feats_downsample: Sequence[int],
    psize: int,
    ptype: str = "center",
) -> jax.Array:
    """Gather normalised hypercolumn patches around 2D points.

    Args:
      feats: pyramid of channels-last maps; ``feats[0]`` is the input
        image ``(B, H, W, 3)``, deeper levels are downsampled by the
        cumulative product of ``feats_downsample``.
      points: ``(B, N, 2)`` float (x, y) pixel coordinates in the input
        image frame (truncated to int like the reference's ``.long()``).
      feat_idx: which pyramid levels contribute to the hypercolumn.
      feats_downsample: per-level downsample factors, e.g.
        ``[1, 2, 2, 2, 2]`` (last entry 1 under change_stride).
      psize: patch side length.
      ptype: 'center' subtracts psize//2 from the offsets.

    Returns:
      ``(B, N, psize, psize, D)``, L2-normalised over D.
    """
    x0 = points[..., 0].astype(jnp.int32)  # (B, N)
    y0 = points[..., 1].astype(jnp.int32)
    if ptype == "center":
        x0 = x0 - psize // 2
        y0 = y0 - psize // 2

    level_ds = _level_downsamples(feat_idx, feats_downsample)
    gathered = []
    for j, fmap in enumerate(feats):
        if j not in feat_idx:
            continue
        gathered.append(
            _gather_level_blocks(fmap, y0, x0, psize, level_ds[j])
        )
    hyper = jnp.concatenate(gathered, axis=-1)  # (B, N, p, p, D)
    return l2_normalize(hyper, axis=-1)


def gather_local_patches_ref(
    feats: Sequence[jax.Array],
    points: jax.Array,
    feat_idx: Sequence[int],
    feats_downsample: Sequence[int],
    psize: int,
    ptype: str = "center",
) -> jax.Array:
    """Naive per-pixel gather (the reference formulation); kept as the
    parity oracle for :func:`gather_local_patches`."""
    b, n, _ = points.shape
    dy, dx = _patch_offsets(psize, ptype)
    x0 = points[..., 0].astype(jnp.int32)
    y0 = points[..., 1].astype(jnp.int32)
    xs_im = (x0[..., None] + dx[None, None, :]).reshape(b, -1)
    ys_im = (y0[..., None] + dy[None, None, :]).reshape(b, -1)

    level_ds = _level_downsamples(feat_idx, feats_downsample)
    gathered = []
    for j, fmap in enumerate(feats):
        if j not in feat_idx:
            continue
        ds_j = level_ds[j]
        hj, wj, cj = fmap.shape[1], fmap.shape[2], fmap.shape[3]
        xs = jnp.clip(xs_im // ds_j, 0, wj - 1)
        ys = jnp.clip(ys_im // ds_j, 0, hj - 1)
        flat = fmap.reshape(b, hj * wj, cj)
        lin = ys * wj + xs
        gathered.append(jnp.take_along_axis(flat, lin[..., None], axis=1))
    hyper = jnp.concatenate(gathered, axis=-1)
    hyper = l2_normalize(hyper, axis=-1)
    d = hyper.shape[-1]
    return hyper.reshape(b, n, psize, psize, d)


def _gather_level_tiled(
    fmap: jax.Array, y_base: jax.Array, x_base: jax.Array, psize: int, ds: int,
    tpx: int,
) -> jax.Array:
    """Per-level patch sampling via a 2x2 superblock of ``tpx``-px tiles.

    Any ``psize``-px patch fits inside two consecutive ``tpx``-px tiles
    per axis when ``tpx >= psize`` (the patch crosses at most one tile
    boundary), so instead of one scattered ``dynamic_slice`` per
    proposal this gathers FOUR contiguous space-to-depth rows per
    proposal — a single row-gather op over a flattened tile array,
    which the TPU executes as large sequential DMA reads. Output is
    bit-identical to the reference's per-pixel
    ``clip((base+d)//ds, 0, dim-1)`` sampling (edge replication
    included): the clamped pixel index always lands inside the clamped
    2x2 superblock window.

    Requires H and W divisible by ``tpx`` (eval sizes are snapped to
    multiples of upsample*ksize >= 16, /root/reference/utils/datasets/
    preprocess.py:83-91) and at least 2x2 tiles per map.
    """
    b, h, w, c = fmap.shape
    t = tpx // ds  # tile side in level cells
    nty, ntx = h // t, w // t
    # superblock anchor tile (top-left), clamped so 2x2 tiles fit
    ky = jnp.clip(y_base // tpx, 0, nty - 2)  # (B, N)
    kx = jnp.clip(x_base // tpx, 0, ntx - 2)

    tiles = fmap.reshape(b, nty, t, ntx, t, c)
    tiles = tiles.transpose(0, 1, 3, 2, 4, 5).reshape(b, nty * ntx, t * t * c)
    # 4 tile rows per proposal: (ky+{0,1}) x (kx+{0,1})
    dyx = jnp.asarray([[0, 0], [0, 1], [1, 0], [1, 1]], jnp.int32)
    lin = ((ky[..., None] + dyx[None, None, :, 0]) * ntx
           + (kx[..., None] + dyx[None, None, :, 1]))  # (B, N, 4)
    n = lin.shape[1]
    rows = jnp.take_along_axis(
        tiles, lin.reshape(b, n * 4, 1), axis=1
    )  # (B, N*4, t*t*c)
    blk = rows.reshape(b, n, 2, 2, t, t, c)
    blk = blk.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, n, 2 * t, 2 * t, c)

    # within-superblock indices reproducing clip((base+d)//ds, 0, dim-1)
    d = jnp.arange(psize)
    iy = jnp.clip((y_base[..., None] + d) // ds, 0, h - 1) - ky[..., None] * t
    ix = jnp.clip((x_base[..., None] + d) // ds, 0, w - 1) - kx[..., None] * t
    iy = jnp.clip(iy, 0, 2 * t - 1)  # (B, N, psize)
    ix = jnp.clip(ix, 0, 2 * t - 1)
    out = jnp.take_along_axis(blk, iy[..., None, None], axis=2)
    out = jnp.take_along_axis(out, ix[:, :, None, :, None], axis=3)
    return out  # (B, N, psize, psize, C)


def gather_local_patches_tiled(
    feats: Sequence[jax.Array],
    points: jax.Array,
    feat_idx: Sequence[int],
    feats_downsample: Sequence[int],
    psize: int,
    ptype: str = "center",
) -> jax.Array:
    """Row-gather variant of :func:`gather_local_patches` (same output).

    Uses 2x2 superblocks of psize-px tiles per level (see
    :func:`_gather_level_tiled`); exactly equal to the reference/naive
    gather whenever every feature map dimension is a multiple of
    ``psize`` and at least ``2*psize`` pixels — true for all snapped
    eval sizes and the 480x320 training resolution.
    """
    x0 = points[..., 0].astype(jnp.int32)
    y0 = points[..., 1].astype(jnp.int32)
    if ptype == "center":
        x0 = x0 - psize // 2
        y0 = y0 - psize // 2

    level_ds = _level_downsamples(feat_idx, feats_downsample)
    gathered = []
    for j, fmap in enumerate(feats):
        if j not in feat_idx:
            continue
        gathered.append(
            _gather_level_tiled(fmap, y0, x0, psize, level_ds[j], psize)
        )
    hyper = jnp.concatenate(gathered, axis=-1)
    return l2_normalize(hyper, axis=-1)


def make_padded_tiles(fmap: jax.Array, psize: int, ds: int) -> jax.Array:
    """Padded flat tile rows for the superblock gathers of one level.

    Edge-pads one psize-px ring (absorbing the reference's border clamp:
    ``padmap[(y0p+d)//ds] == origmap[clip((y0+d)//ds, 0, h-1)]``; a
    corner clipped at either end lands its whole window inside the
    ring) and space-to-depths into FLAT (wy, wx*C) tile rows:
    ``(B, nty*ntx, t*t*C)`` with t = psize//ds, nty/ntx = dim//t + 2.

    This is the expensive data-movement half of the gather (a full
    pad copy + tiling transpose of the feature map); hoist it out of
    per-stage calls — the mid and fine stages (and both train stages)
    gather from the SAME pyramid, so the tiles are built once per
    image and reused (pass via ``tiles=`` to the gather entry points).
    """
    b, h, w, c = fmap.shape
    t = psize // ds
    fp = jnp.pad(fmap, ((0, 0), (t, t), (t, t), (0, 0)), mode="edge")
    nty, ntx = h // t + 2, w // t + 2
    tiles = fp.reshape(b, nty, t, ntx, t * c)
    return tiles.transpose(0, 1, 3, 2, 4).reshape(b, nty * ntx, t * t * c)


def _superblock_rows(
    fmap: jax.Array, y0p: jax.Array, x0p: jax.Array, psize: int, ds: int,
    tiles: jax.Array | None = None,
):
    """Shared front half of the padded superblock gathers.

    Gathers the 2x2 superblock of flat (wy, wx*C) tile rows per
    proposal from :func:`make_padded_tiles` (built here when not
    supplied pre-computed).

    Returns ``(rows, iy, ix)``: rows ``(B, N, ty=2, tx=2, t, t*C)`` and
    the within-superblock window indices ``(B, N, psize)`` in [0, 2t).
    """
    b, h, w, c = fmap.shape
    t = psize // ds
    n = y0p.shape[1]
    if tiles is None:
        tiles = make_padded_tiles(fmap, psize, ds)
    ntx = w // t + 2

    ky = y0p // psize  # in [0, nty-2] by the clip contract
    kx = x0p // psize
    dyx = jnp.asarray([[0, 0], [0, 1], [1, 0], [1, 1]], jnp.int32)
    lin = ((ky[..., None] + dyx[None, None, :, 0]) * ntx
           + (kx[..., None] + dyx[None, None, :, 1]))  # (B, N, 4)
    rows = jnp.take_along_axis(
        tiles, lin.reshape(b, n * 4, 1), axis=1
    ).reshape(b, n, 2, 2, t, t * c)  # (ty, tx, wy, wx*C)

    d = jnp.arange(psize)
    # within-superblock level indices (no clipping needed: the ring
    # covers every in-window read)
    iy = (y0p[..., None] + d) // ds - ky[..., None] * t  # (B, N, psize)
    ix = (x0p[..., None] + d) // ds - kx[..., None] * t
    return rows, iy, ix


def _gather_level_flat(
    fmap: jax.Array, y0p: jax.Array, x0p: jax.Array, psize: int, ds: int,
    tiles: jax.Array | None = None,
) -> jax.Array:
    """Superblock row-gather + FLAT-LANE expansion for one level.

    fmap: (B, H, W, C) unpadded level features (stride ``ds``).
    y0p/x0p: (B, N) patch corners in PADDED pixel coords (+psize for
    the one-tile edge-replication ring, clipped to [0, dim+psize-1]).
    Returns (B, N, psize, psize, C), bit-identical to the reference's
    per-pixel ``clip((base+d)//ds, 0, dim-1)`` sampling.

    Measured design (see BASELINE.md): the take-based expansion of
    :func:`_gather_level_tiled` operates on ``(.., 2t, 2t, C)`` arrays
    whose C-minor layout wastes lanes (42x for the 3-channel image
    level) and needs an interleave transpose plus two chained takes.
    This formulation instead

      * keeps tile rows FLAT as (wy, wx*C) — full lanes even for C=3,
      * slices ``tx`` to make (ty, wy) ADJACENT (pure reshape, no
        interleave transpose), takes the psize y-rows, concatenates the
        two tx halves on the LANE axis,
      * extracts the x window with ONE lane-take of ``psize*C``
        contiguous-per-cell lanes.

    6.5 -> 1.8 ms for the image level at eval scale (N=768, f32).
    """
    b, h, w, c = fmap.shape
    t = psize // ds
    n = y0p.shape[1]
    rows, iy, ix = _superblock_rows(fmap, y0p, x0p, psize, ds, tiles)
    cols = []
    for tx in range(2):
        blk = rows[:, :, :, tx].reshape(b, n, 2 * t, t * c)
        cols.append(
            jnp.take_along_axis(blk, iy[..., None], axis=2)
        )  # (B, N, psize, t*C)
    wide = jnp.concatenate(cols, axis=-1)  # (B, N, psize, 2t*C)

    lanes = (ix[..., None] * c + jnp.arange(c)).reshape(b, n, psize * c)
    out = jnp.take_along_axis(wide, lanes[:, :, None, :], axis=3)
    return out.reshape(b, n, psize, psize, c)


def _gather_level_onehot(
    fmap: jax.Array, y0p: jax.Array, x0p: jax.Array, psize: int, ds: int,
    tiles: jax.Array | None = None,
) -> jax.Array:
    """Superblock row-gather + ONE-HOT MATMUL expansion for one level.

    Same contract as :func:`_gather_level_flat` (padded corners in,
    bit-exact reference sampling out) but the within-superblock window
    extraction runs on the MXU: the y window is selected by a
    ``(psize, 2t)`` one-hot matrix contracted against the (ty,wy)-major
    rows, the x window by a second one-hot contraction over the 2t
    superblock columns. ``Precision.HIGHEST`` keeps the pass-through
    exact (a one-hot row has a single nonzero; bf16/f32 inputs are
    carried unrounded — default bf16 MXU precision would round f32
    inputs). Gathers along tiny non-lane axes degenerate on TPU for
    fat-channel maps; these two batched matmuls replace them with MXU
    traffic and give the regressor-facing VJP a transposed matmul
    instead of a scatter-add. Measured at eval scale (N=768): level1
    (C=64, ds=2) 2.47 -> 2.01 ms, level2 (C=64, ds=4) 1.07 -> 0.51,
    level3 (C=128, ds=8) 0.81 -> 0.18; the C=3 image level stays on
    the flat-lane path (6.6x cheaper there).
    """
    b, h, w, c = fmap.shape
    t = psize // ds
    n = y0p.shape[1]
    rows, iy, ix = _superblock_rows(fmap, y0p, x0p, psize, ds, tiles)
    # (ty, wy) adjacent per tx half -> (B, N, tx, 2t, t*C)
    blk = rows.transpose(0, 1, 3, 2, 4, 5).reshape(b, n, 2, 2 * t, t * c)
    sy = (iy[..., None] == jnp.arange(2 * t)).astype(fmap.dtype)
    mid = jnp.einsum(
        "bnpk,bnxkc->bnxpc", sy, blk,
        preferred_element_type=fmap.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, N, tx, psize, t*C)
    wide = mid.transpose(0, 1, 3, 2, 4).reshape(
        b, n, psize, 2 * t, c
    )  # (tx, wx) merged -> global superblock column
    sx = (ix[..., None] == jnp.arange(2 * t)).astype(fmap.dtype)
    out = jnp.einsum(
        "bnqk,bnpkc->bnpqc", sx, wide,
        preferred_element_type=fmap.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out  # (B, N, psize, psize, C)


# The one-hot MXU expansion beats the flat lane-take expansion on
# EVERY pyramid level once measured head-to-head (eval scale, N=768:
# level0 C=3 1.83 -> 1.20 ms, level1 C=64 15.5 -> 1.98, level2 0.31,
# level3 0.21), so the dispatch bound is vestigial: levels gather uses
# one-hot throughout. The flat expansion is kept for reference and
# regression tests (it was the first formulation to fix level-0's
# 42x lane waste, 6.7 -> 1.8 ms).
FLAT_GATHER_MAX_C = 0


def _levels_inv_norm(gathered: Sequence[jax.Array], eps: float = 1e-6) -> jax.Array:
    """Per-pixel inverse hypercolumn L2 norm from UNCONCATENATED levels.

    Equivalent to the ``rsqrt(sum(x^2) + eps)`` factor of
    :func:`l2_normalize` over the channel concat, computed as a sum of
    per-level f32 square-sums — the (B, N, p, p, D) concat tensor never
    exists. Returns ``(B, N, p, p, 1)`` float32.
    """
    sq = None
    for g in gathered:
        s = jnp.sum(jnp.square(g.astype(jnp.float32)), axis=-1, keepdims=True)
        sq = s if sq is None else sq + s
    return jax.lax.rsqrt(sq + eps)


def make_padded_tiles_levels(
    feats: Sequence[jax.Array],
    feat_idx: Sequence[int],
    feats_downsample: Sequence[int],
    psize: int,
) -> Tuple[jax.Array, ...]:
    """:func:`make_padded_tiles` for every gathered pyramid level, in
    ``feat_idx`` order — build once per image, pass to every
    :func:`gather_local_patches_tiled_levels` call on that pyramid."""
    level_ds = _level_downsamples(feat_idx, feats_downsample)
    return tuple(
        make_padded_tiles(fmap, psize, level_ds[j])
        for j, fmap in enumerate(feats)
        if j in feat_idx
    )


def gather_local_patches_tiled_levels(
    feats: Sequence[jax.Array],
    points: jax.Array,
    feat_idx: Sequence[int],
    feats_downsample: Sequence[int],
    psize: int,
    ptype: str = "center",
    tiles: Sequence[jax.Array] | None = None,
) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
    """:func:`gather_local_patches_tiled` without the concat+normalize.

    Returns ``(levels, inv_norm)`` where ``levels[i]`` is the
    (B, N, psize, psize, C_i) patch tensor of pyramid level
    ``feat_idx[i]`` in its ORIGINAL dtype and ``inv_norm`` is the
    (B, N, psize, psize, 1) f32 hypercolumn normalizer. Consumers that
    contract over the hypercolumn (the regressor's first conv) apply
    the kernel per level slice and scale by ``inv_norm`` — exactly
    ``l2_normalize(concat(levels))`` by linearity, but the wide f32
    concat tensor (0.8 GB at eval scale) is never materialised.

    Per level this dispatches between two equal-output formulations
    measured on chip: the flat-lane expansion for skinny-channel maps
    (the C=3 image level, :func:`_gather_level_flat`) and the one-hot
    MXU expansion otherwise (:func:`_gather_level_onehot`).
    """
    x0 = points[..., 0].astype(jnp.int32)
    y0 = points[..., 1].astype(jnp.int32)
    if ptype == "center":
        x0 = x0 - psize // 2
        y0 = y0 - psize // 2

    h_im, w_im = feats[0].shape[1], feats[0].shape[2]
    x0p = jnp.clip(x0 + psize, 0, w_im + psize - 1)
    y0p = jnp.clip(y0 + psize, 0, h_im + psize - 1)

    level_ds = _level_downsamples(feat_idx, feats_downsample)
    gathered = []
    li = 0
    for j, fmap in enumerate(feats):
        if j not in feat_idx:
            continue
        kernel = (
            _gather_level_flat
            if fmap.shape[-1] <= FLAT_GATHER_MAX_C
            else _gather_level_onehot
        )
        lt = tiles[li] if tiles is not None else None
        gathered.append(kernel(fmap, y0p, x0p, psize, level_ds[j], lt))
        li += 1
    return tuple(gathered), _levels_inv_norm(gathered)


def _superblock_rows_flat(
    feats, x0, y0, feat_idx, feats_downsample, psize, tiles
):
    """Padded corners + flat per-level superblock rows for one side.

    Returns ``(y0p, x0p, rows_list, ds_list)`` with rows_list[l] of
    shape ``(B*N, 4, t_l, t_l*C_l)``.
    """
    b, n = x0.shape
    h_im, w_im = feats[0].shape[1], feats[0].shape[2]
    x0p = jnp.clip(x0 + psize, 0, w_im + psize - 1)
    y0p = jnp.clip(y0 + psize, 0, h_im + psize - 1)

    level_ds = _level_downsamples(feat_idx, feats_downsample)
    rows_list = []
    ds_list = []
    li = 0
    for j, fmap in enumerate(feats):
        if j not in feat_idx:
            continue
        ds = level_ds[j]
        t = psize // ds
        c = fmap.shape[-1]
        lt = tiles[li] if tiles is not None else None
        rows, _, _ = _superblock_rows(fmap, y0p, x0p, psize, ds, lt)
        rows_list.append(rows.reshape(b * n, 4, t, t * c))
        ds_list.append(ds)
        li += 1
    return y0p.reshape(-1), x0p.reshape(-1), rows_list, ds_list


def gather_scaled_patch_pairs_fused(
    feats1: Sequence[jax.Array],
    feats2: Sequence[jax.Array],
    coords: jax.Array,
    feat_idx: Sequence[int],
    feats_downsample: Sequence[int],
    psize: int,
    out_dtype,
    ptype: str = "center",
    tiles1: Sequence[jax.Array] | None = None,
    tiles2: Sequence[jax.Array] | None = None,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> Tuple[Tuple[jax.Array, ...], Tuple[Tuple[Tuple[int, int], ...], ...]]:
    """Two-sided superblock gather + fused Pallas expansion/normalise/
    scale (ops/patch_expand_pallas.py).

    ``coords``: (B, N, 4) match endpoints (x1, y1, x2, y2). The row
    takes stay in XLA (the only scattered access); everything
    downstream lives in VMEM. Returns ``(patches, slice_map)``:
    ``patches`` is a flat tuple of scaled ``(B*N, psize, psize, .)``
    patch tensors — channel-paired ``2*C_l`` for C=64 levels,
    per-side ``C_l`` pairs otherwise — each value exactly
    ``scaled(gather_tiled_levels(...))`` of the unfused path;
    ``slice_map`` gives each tensor's regressor kernel-channel slices
    (SegmentedConv convention, [side-1 levels | side-2 levels] cin
    layout).

    ``use_pallas=None`` dispatches on the backend (Pallas on TPU, the
    identical-math XLA formulation elsewhere); ``P2P_EXPAND_BACKEND``
    in {"xla", "pallas"} overrides.
    """
    from patch2pix_tpu.ops.conv4d import _tpu_backend
    from patch2pix_tpu.ops.patch_expand_pallas import (
        expand_scale_pair_pallas,
        expand_scale_pair_xla,
        output_slice_map,
    )

    def corners(points):
        x0 = points[..., 0].astype(jnp.int32)
        y0 = points[..., 1].astype(jnp.int32)
        if ptype == "center":
            x0 = x0 - psize // 2
            y0 = y0 - psize // 2
        return x0, y0

    x1, y1 = corners(coords[..., 0:2])
    x2, y2 = corners(coords[..., 2:4])
    y1p, x1p, rows1, ds_list = _superblock_rows_flat(
        feats1, x1, y1, feat_idx, feats_downsample, psize, tiles1
    )
    y2p, x2p, rows2, _ = _superblock_rows_flat(
        feats2, x2, y2, feat_idx, feats_downsample, psize, tiles2
    )

    if use_pallas is None:
        env = os.environ.get("P2P_EXPAND_BACKEND")
        if env is not None:
            use_pallas = env == "pallas" and _tpu_backend()
        else:
            use_pallas = _tpu_backend()
    if use_pallas:
        outs = expand_scale_pair_pallas(
            tuple(rows1), tuple(rows2), y1p, x1p, y2p, x2p,
            psize, tuple(ds_list), out_dtype, interpret,
        )
    else:
        outs = expand_scale_pair_xla(
            tuple(rows1), tuple(rows2), y1p, x1p, y2p, x2p,
            psize, tuple(ds_list), out_dtype,
        )
    cs = tuple(r.shape[3] // r.shape[2] for r in rows1)
    return outs, output_slice_map(ds_list, cs, psize)


def gather_local_patches_levels(
    feats: Sequence[jax.Array],
    points: jax.Array,
    feat_idx: Sequence[int],
    feats_downsample: Sequence[int],
    psize: int,
    ptype: str = "center",
) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
    """Block-slice variant of :func:`gather_local_patches_tiled_levels`
    (the fallback when map dims are not psize-tileable)."""
    x0 = points[..., 0].astype(jnp.int32)
    y0 = points[..., 1].astype(jnp.int32)
    if ptype == "center":
        x0 = x0 - psize // 2
        y0 = y0 - psize // 2

    level_ds = _level_downsamples(feat_idx, feats_downsample)
    gathered = []
    for j, fmap in enumerate(feats):
        if j not in feat_idx:
            continue
        gathered.append(
            _gather_level_blocks(fmap, y0, x0, psize, level_ds[j])
        )
    return tuple(gathered), _levels_inv_norm(gathered)


def gather_local_patches_grid_levels(
    feats: Sequence[jax.Array],
    points: jax.Array,
    feat_idx: Sequence[int],
    feats_downsample: Sequence[int],
    psize: int,
) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
    """Grid-aligned variant of
    :func:`gather_local_patches_tiled_levels` (see
    :func:`gather_local_patches_grid` for the alignment contract)."""
    b, n, _ = points.shape
    gx = ((points[..., 0].astype(jnp.int32) - psize // 2) // psize)  # (B, N)
    gy = ((points[..., 1].astype(jnp.int32) - psize // 2) // psize)

    level_ds = _level_downsamples(feat_idx, feats_downsample)
    gathered = []
    for j, fmap in enumerate(feats):
        if j not in feat_idx:
            continue
        ds = level_ds[j]
        t = psize // ds  # tile side at this level
        bb, h, w, c = fmap.shape
        gxc = jnp.clip(gx, 0, w // t - 1)
        gyc = jnp.clip(gy, 0, h // t - 1)
        tiles = fmap.reshape(bb, h // t, t, w // t, t, c)
        tiles = tiles.transpose(0, 1, 3, 2, 4, 5)  # space-to-depth
        tiles = tiles.reshape(bb, (h // t) * (w // t), t * t * c)
        lin = gyc * (w // t) + gxc  # (B, N)
        rows = jnp.take_along_axis(tiles, lin[..., None], axis=1)
        patch = rows.reshape(b, n, t, 1, t, 1, c)
        patch = jnp.broadcast_to(patch, (b, n, t, ds, t, ds, c))
        gathered.append(patch.reshape(b, n, psize, psize, c))
    return tuple(gathered), _levels_inv_norm(gathered)


def gather_local_patches_grid(
    feats: Sequence[jax.Array],
    points: jax.Array,
    feat_idx: Sequence[int],
    feats_downsample: Sequence[int],
    psize: int,
) -> jax.Array:
    """Patch gather for GRID-ALIGNED centers (the eval mid stage).

    At eval (panc=1) the coarse matches are exactly coarse-cell
    centers ``g*psize + psize//2``, so every 'center' patch is the
    tile ``[g*psize, (g+1)*psize)`` — tile-aligned at every pyramid
    level (16/ds is integral for strides 1..16). The gather then
    reduces to one space-to-depth reshape per level plus a CONTIGUOUS
    row gather per proposal, far cheaper than scattered block slices.

    Exactly equal to :func:`gather_local_patches` whenever
    ``points[..., :] == g * psize + psize//2`` for integer g.
    """
    b, n, _ = points.shape
    gx = ((points[..., 0].astype(jnp.int32) - psize // 2) // psize)  # (B, N)
    gy = ((points[..., 1].astype(jnp.int32) - psize // 2) // psize)

    level_ds = _level_downsamples(feat_idx, feats_downsample)
    gathered = []
    for j, fmap in enumerate(feats):
        if j not in feat_idx:
            continue
        ds = level_ds[j]
        t = psize // ds  # tile side at this level
        bb, h, w, c = fmap.shape
        gxc = jnp.clip(gx, 0, w // t - 1)
        gyc = jnp.clip(gy, 0, h // t - 1)
        tiles = fmap.reshape(bb, h // t, t, w // t, t, c)
        tiles = tiles.transpose(0, 1, 3, 2, 4, 5)  # space-to-depth
        tiles = tiles.reshape(bb, (h // t) * (w // t), t * t * c)
        lin = gyc * (w // t) + gxc  # (B, N)
        rows = jnp.take_along_axis(tiles, lin[..., None], axis=1)
        patch = rows.reshape(b, n, t, 1, t, 1, c)
        patch = jnp.broadcast_to(patch, (b, n, t, ds, t, ds, c))
        gathered.append(patch.reshape(b, n, psize, psize, c))
    hyper = jnp.concatenate(gathered, axis=-1)
    return l2_normalize(hyper, axis=-1)
