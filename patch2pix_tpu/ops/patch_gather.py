"""Hypercolumn local-patch gathering around match endpoints.

Capability parity with ``select_local_patch_feats``
(/root/reference/networks/utils.py:4-36), re-designed batched:

  * one gather per pyramid level over the whole batch (vmap), no
    per-pair Python loop,
  * channels-last output ``(B, N, psize, psize, D)`` feeding the
    regressor's NHWC convs directly,
  * L2 normalisation over the concatenated hypercolumn dim D, per patch
    pixel — the same normalisation point as the reference
    (/root/reference/networks/patch2pix.py:173-174).
"""

from __future__ import annotations

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


def _gather_level(
    fmap: jax.Array, xs: jax.Array, ys: jax.Array
) -> jax.Array:
    """Gather fmap[b, ys, xs] for per-batch index arrays.

    fmap: ``(B, H, W, C)``; xs, ys: ``(B, M)`` int32 already clamped.
    Returns ``(B, M, C)``.
    """
    b, h, w, c = fmap.shape
    flat = fmap.reshape(b, h * w, c)
    lin = ys * w + xs  # (B, M)
    return jnp.take_along_axis(flat, lin[..., None], axis=1)


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
      ``(B, N, psize, psize, D)`` float32, L2-normalised over D.
    """
    b, n, _ = points.shape
    dy, dx = _patch_offsets(psize, ptype)  # (psize*psize,)
    x0 = points[..., 0].astype(jnp.int32)  # (B, N)
    y0 = points[..., 1].astype(jnp.int32)
    # pixel coordinates of every patch element, image frame: (B, N*p*p)
    xs_im = (x0[..., None] + dx[None, None, :]).reshape(b, -1)
    ys_im = (y0[..., None] + dy[None, None, :]).reshape(b, -1)

    gathered = []
    ds = 1
    for j, fmap in enumerate(feats):
        ds_j = ds * feats_downsample[j] if j > 0 else feats_downsample[0]
        ds = ds_j
        if j not in feat_idx:
            continue
        hj, wj = fmap.shape[1], fmap.shape[2]
        xs = jnp.clip(xs_im // ds_j, 0, wj - 1)
        ys = jnp.clip(ys_im // ds_j, 0, hj - 1)
        gathered.append(_gather_level(fmap, xs, ys))  # (B, M, C_j)

    hyper = jnp.concatenate(gathered, axis=-1)  # (B, M, D)
    hyper = l2_normalize(hyper, axis=-1)
    d = hyper.shape[-1]
    return hyper.reshape(b, n, psize, psize, d)
