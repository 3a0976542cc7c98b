"""Fixed-shape match extraction from correlation volumes.

TPU-first redesign of the reference's match plumbing
(/root/reference/networks/ncn/extract_ncmatches.py:6-94 ``corr_to_matches``
and /root/reference/networks/utils.py:38-72 ``filter_coarse``):

  * both matching directions are computed in one pass — no second
    softmax sweep over the volume,
  * "mutual" filtering is a device-side argmax-consistency test instead
    of a host ``np.unique`` round-trip. A row appears in both direction
    lists iff argmax_A(corr[:, b]) = a and argmax_B(corr[a, :]) = b, and
    (because the relocalisation delta is a function of the pooled cell)
    row equality in relocated coordinates is *exactly* equivalent to
    that test, so the surviving match set is identical to the
    reference's ``np.unique(..., counts > 1)``,
  * everything is fixed shape: ``N = h2*w2 + h1*w1`` rows with a
    validity mask; ``select_ptmax`` resamples to a static proposal count
    for training (the reference's shuffle+tile, on device).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class Matches(NamedTuple):
    """A fixed-size batch of candidate correspondences.

    coords: ``(B, N, 4)`` float32 pixel coordinates (x1, y1, x2, y2).
    scores: ``(B, N)`` float32 matching scores.
    valid:  ``(B, N)`` bool validity mask (padding/filtered rows False).
    """

    coords: jax.Array
    scores: jax.Array
    valid: jax.Array

    @property
    def n(self) -> int:
        return self.coords.shape[1]


def corr_to_matches(
    corr: jax.Array,
    delta4d: Optional[Tuple[jax.Array, jax.Array, jax.Array, jax.Array]] = None,
    ksize: int = 1,
    do_softmax: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Extract per-cell best matches from a 4D correlation volume.

    Both matching directions are returned concatenated — first the
    B->A direction (one row per target cell, ``h2*w2`` rows, the
    reference's default direction), then A->B (one row per source cell,
    ``h1*w1`` rows, the reference's ``invert_matching_direction=True``).

    Args:
      corr: ``(B, h1, w1, h2, w2)`` (post neighbourhood-consensus).
      delta4d: optional relocalisation source. Any of: the 4-tuple of
        within-window offset volumes from :func:`maxpool4d`; the raw
        PRE-POOL volume (offsets decoded lazily at the selected cells,
        :func:`..correlation.decode_delta_at`); or ``("feats", f1, f2)``
        from the fused corr+pool path (offsets recomputed from the
        features, :func:`..corr_pool_pallas.decode_delta_from_feats`).
        When given, indices are relocated to the pre-pool grid:
        ``i*ksize + di``.
      ksize: the pooling factor used to produce ``corr``.
      do_softmax: score = softmax over the reduced axis (argmax is
        taken on raw values; softmax is monotonic so they agree).

    Returns:
      grid: ``(B, N, 4)`` int32 (xA, yA, xB, yB) indices in the
        pre-pool feature grid, ``N = h2*w2 + h1*w1``.
      scores: ``(B, N)`` float32.
      mutual: ``(B, N)`` bool — True iff the row's (source, target) pair
        is an argmax-consistent mutual match. Mutual rows appear in both
        halves; consumers use :func:`mutual_consistency_mask` to pick a
        canonical copy.
    """
    b, h1, w1, h2, w2 = corr.shape
    na, nb = h1 * w1, h2 * w2
    flat = corr.reshape(b, na, nb)

    # direction 1 (B->A): reduce over source cells
    arg1 = jnp.argmax(flat, axis=1)  # (B, nb) -> index into na
    # direction 2 (A->B): reduce over target cells
    arg2 = jnp.argmax(flat, axis=2)  # (B, na) -> index into nb

    m1 = jnp.max(flat, axis=1)  # (B, nb)
    m2 = jnp.max(flat, axis=2)  # (B, na)
    if do_softmax:
        # max of softmax without materializing the softmax volume:
        # softmax(x)[argmax] = exp(max - logsumexp)
        score1 = jnp.exp(m1 - jax.scipy.special.logsumexp(flat, axis=1))
        score2 = jnp.exp(m2 - jax.scipy.special.logsumexp(flat, axis=2))
    else:
        score1, score2 = m1, m2

    # mutual consistency: round-trip argmax returns to the anchor cell
    ids_b = jnp.arange(nb)[None, :]
    ids_a = jnp.arange(na)[None, :]
    mutual1 = jnp.take_along_axis(arg2, arg1, axis=1) == ids_b  # (B, nb)
    mutual2 = jnp.take_along_axis(arg1, arg2, axis=1) == ids_a  # (B, na)

    # decode 2D indices; direction 1 rows are (argmax_A, anchor_B)
    ia1, ja1 = arg1 // w1, arg1 % w1
    ib1 = jnp.broadcast_to(ids_b // w2, (b, nb))
    jb1 = jnp.broadcast_to(ids_b % w2, (b, nb))
    # direction 2 rows are (anchor_A, argmax_B)
    ia2 = jnp.broadcast_to(ids_a // w1, (b, na))
    ja2 = jnp.broadcast_to(ids_a % w1, (b, na))
    ib2, jb2 = arg2 // w2, arg2 % w2

    ia = jnp.concatenate([ia1, ia2], axis=1)
    ja = jnp.concatenate([ja1, ja2], axis=1)
    ib = jnp.concatenate([ib1, ib2], axis=1)
    jb = jnp.concatenate([jb1, jb2], axis=1)

    ia, ja, ib, jb = _relocate(delta4d, ia, ja, ib, jb, ksize, (w1, h2, w2))

    grid = jnp.stack([ja, ia, jb, ib], axis=-1).astype(jnp.int32)  # x, y order
    scores = jnp.concatenate([score1, score2], axis=1)
    mutual = jnp.concatenate([mutual1, mutual2], axis=1)
    return grid, scores, mutual


def _relocate(delta4d, ia, ja, ib, jb, ksize, dims):
    """Relocate pooled-grid indices to the pre-pool grid (i*ksize + di)
    from any of the supported delta sources; no-op scaling without one."""
    w1, h2, w2 = dims
    if (
        isinstance(delta4d, (tuple, list))
        and len(delta4d) == 3
        and delta4d[0] == "feats"
    ):
        # fused corr+pool path: no pre-pool volume exists; offsets are
        # recomputed from the features at the selected cells
        from patch2pix_tpu.ops.corr_pool_pallas import decode_delta_from_feats

        _, feat1, feat2 = delta4d
        di, dj, dk, dl = decode_delta_from_feats(
            feat1, feat2, ia, ja, ib, jb, ksize
        )
    elif delta4d is not None and not isinstance(delta4d, (tuple, list)):
        # lazy relocalisation: delta4d is the PRE-POOL volume; offsets
        # are recomputed for just the N selected cells instead of
        # materialising four full int32 delta volumes (see
        # correlation.maxpool4d_values / decode_delta_at)
        from patch2pix_tpu.ops.correlation import decode_delta_at

        di, dj, dk, dl = decode_delta_at(delta4d, ia, ja, ib, jb, ksize)
    elif delta4d is not None:
        d4 = delta4d
        b = ia.shape[0]
        lin = ((ia * w1 + ja) * h2 + ib) * w2 + jb  # (B, N)
        gather = lambda d: jnp.take_along_axis(d.reshape(b, -1), lin, axis=1)
        di, dj, dk, dl = (gather(d) for d in d4)
    elif ksize != 1:
        return ia * ksize, ja * ksize, ib * ksize, jb * ksize
    else:
        return ia, ja, ib, jb
    return ia * ksize + di, ja * ksize + dj, ib * ksize + dk, jb * ksize + dl


def corr_to_matches_topk(
    corr: jax.Array,
    delta4d=None,
    topk: int = 1,
    ksize: int = 1,
    do_softmax: bool = True,
    invert_matching_direction: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k match extraction — parity shim for the reference's
    ``corr_to_matches_topk`` (/root/reference/networks/ncn/
    extract_ncmatches.py:96-158; dead code there — zero callers — kept
    for API completeness).

    One direction only, k best source (or target) cells per anchor via
    ``lax.top_k``; scores are softmax values when ``do_softmax``.

    Returns:
      grid: ``(B, N, 4)`` int32 (xA, yA, xB, yB) pre-pool grid indices,
        ``N = k * h2*w2`` (default) or ``h1*w1 * k`` (inverted) — the
        reference's row ordering for each direction.
      scores: ``(B, N)`` float32.
    """
    b, h1, w1, h2, w2 = corr.shape
    na, nb = h1 * w1, h2 * w2
    flat = corr.reshape(b, na, nb)
    if invert_matching_direction:
        # reduce over TARGET cells: k best B-cells per A-anchor
        vals = jax.nn.softmax(flat, axis=2) if do_softmax else flat
        top_v, top_i = jax.lax.top_k(vals, topk)  # (B, na, k)
        ib = (top_i // w2).reshape(b, -1)
        jb = (top_i % w2).reshape(b, -1)
        ids_a = jnp.arange(na)[None, :, None]
        ia = jnp.broadcast_to(ids_a // w1, (b, na, topk)).reshape(b, -1)
        ja = jnp.broadcast_to(ids_a % w1, (b, na, topk)).reshape(b, -1)
    else:
        # reduce over SOURCE cells: k best A-cells per B-anchor; the
        # reference orders rows k-major here (view(b, topk, -1))
        vals = jax.nn.softmax(flat, axis=1) if do_softmax else flat
        top_v, top_i = jax.lax.top_k(
            jnp.swapaxes(vals, 1, 2), topk
        )  # (B, nb, k)
        top_v = jnp.swapaxes(top_v, 1, 2)  # (B, k, nb)
        top_i = jnp.swapaxes(top_i, 1, 2)
        ia = (top_i // w1).reshape(b, -1)
        ja = (top_i % w1).reshape(b, -1)
        ids_b = jnp.arange(nb)[None, None, :]
        ib = jnp.broadcast_to(ids_b // w2, (b, topk, nb)).reshape(b, -1)
        jb = jnp.broadcast_to(ids_b % w2, (b, topk, nb)).reshape(b, -1)
    scores = top_v.reshape(b, -1).astype(jnp.float32)

    ia, ja, ib, jb = _relocate(delta4d, ia, ja, ib, jb, ksize, (w1, h2, w2))
    grid = jnp.stack([ja, ia, jb, ib], axis=-1).astype(jnp.int32)
    return grid, scores


def mutual_consistency_mask(
    mutual: jax.Array, nb: int, keep_mutual_only: bool
) -> jax.Array:
    """Validity mask replicating the reference's unique/mutual filter.

    The reference concatenates both direction lists and runs
    ``np.unique(rows)``: mutual pairs appear in both halves and collapse
    to their first (direction-1) occurrence; with ``mutual=True`` only
    rows with count > 1 survive (/root/reference/networks/utils.py:42-46).

    Args:
      mutual: ``(B, N)`` mutuality flags from :func:`corr_to_matches`.
      nb: number of direction-1 rows (``h2*w2``) at the front.
      keep_mutual_only: the reference's ``mutual`` flag.

    Returns:
      ``(B, N)`` bool mask. mutual=True: direction-1 mutual rows only.
      mutual=False: all direction-1 rows + non-mutual direction-2 rows
      (mutual direction-2 rows are the duplicates ``np.unique`` drops).
    """
    m1 = mutual[:, :nb]
    m2 = mutual[:, nb:]
    if keep_mutual_only:
        return jnp.concatenate([m1, jnp.zeros_like(m2)], axis=1)
    return jnp.concatenate([jnp.ones_like(m1), ~m2], axis=1)


def score_threshold_mask(
    valid: jax.Array, scores: jax.Array, thres: float
) -> jax.Array:
    """Apply the NC-score threshold with the reference's keep-all fallback.

    If no valid row passes the threshold the mask is left unchanged
    (the reference skips the score filter when it would empty the set,
    /root/reference/networks/utils.py:53,65).
    """
    passed = valid & (scores > thres)
    any_passed = jnp.any(passed, axis=1, keepdims=True)
    return jnp.where(any_passed, passed, valid)


def select_ptmax(
    key: jax.Array,
    coords: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    ptmax: int,
) -> Matches:
    """Resample valid rows to exactly ``ptmax`` proposals per pair.

    Device-side equivalent of the reference's shuffle + tile
    (/root/reference/networks/utils.py:55-63): valid rows are randomly
    permuted and cycled until ``ptmax`` slots are filled. If a pair has
    no valid rows, row 0 is used (the reference inserts a dummy index-0
    match in that case, :57-59).

    Args:
      key: PRNG key.
      coords: ``(B, N, 4)``.
      scores: ``(B, N)``.
      valid: ``(B, N)`` bool.
      ptmax: static output size.

    Returns:
      :class:`Matches` with ``N = ptmax`` and an all-True valid mask
      (every slot holds a real proposal, possibly repeated).
    """
    b, n = scores.shape
    rand = jax.random.uniform(key, (b, n))
    # sort keys: invalid rows pushed to the back, valid rows shuffled
    order = jnp.argsort(jnp.where(valid, rand, 2.0), axis=1)  # (B, N)
    n_valid = jnp.maximum(jnp.sum(valid, axis=1), 1)  # (B,)
    slots = jnp.arange(ptmax)[None, :] % n_valid[:, None]  # (B, ptmax)
    ids = jnp.take_along_axis(order, slots, axis=1)  # (B, ptmax)
    out_coords = jnp.take_along_axis(coords, ids[..., None], axis=1)
    out_scores = jnp.take_along_axis(scores, ids, axis=1)
    return Matches(
        coords=out_coords,
        scores=out_scores,
        valid=jnp.ones((b, ptmax), dtype=bool),
    )


def grid_to_pixel(
    grid: jax.Array, upsample: int, center: bool = True
) -> jax.Array:
    """Feature-grid indices -> input-image pixel coordinates.

    Matches the reference's coarse-match scaling
    (/root/reference/networks/patch2pix.py:371-374): multiply by the
    feature stride and optionally add stride/2 to hit the cell centre.
    """
    pix = grid.astype(jnp.float32) * float(upsample)
    if center:
        pix = pix + float(upsample // 2)
    return pix
