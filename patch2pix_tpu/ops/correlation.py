"""4D feature correlation, mutual-matching gating and 4D max-pooling.

Capability parity with the reference ops (see
/root/reference/networks/modules.py:11-53 ``maxpool4d``/``FeatCorrelation``
and /root/reference/networks/ncn/model.py:157-176 ``MutualMatching``),
re-designed for TPU:

  * features are channels-last ``(B, H, W, C)`` so upstream convs hit the
    native TPU layout,
  * the correlation volume is kept as ``(B, h1, w1, h2, w2)`` — no dummy
    channel axis, no permutes,
  * maxpool4d is a reshape + single max/argmax reduction instead of a
    k^4 Python slice loop; the argmax decode matches the reference's
    (i, j, k, l) ordering so relocalisation offsets agree exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(feat: jax.Array, axis: int = -1, eps: float = 1e-6) -> jax.Array:
    """L2-normalise ``feat`` along ``axis``.

    Matches the reference normalisation
    (/root/reference/networks/modules.py:6): x / sqrt(sum(x^2) + eps).
    The square-sum accumulates in float32 even for bf16 inputs; the
    output keeps the input dtype.
    """
    sq = jnp.sum(jnp.square(feat.astype(jnp.float32)), axis=axis, keepdims=True)
    return feat * jax.lax.rsqrt(sq + eps).astype(feat.dtype)


def feat_correlation(feat1: jax.Array, feat2: jax.Array) -> jax.Array:
    """Dense 4D correlation volume between two feature maps.

    Args:
      feat1: ``(B, h1, w1, C)`` channels-last features.
      feat2: ``(B, h2, w2, C)``.

    Returns:
      ``(B, h1, w1, h2, w2)`` correlation volume
      ``corr[b, i, j, k, l] = <feat1[b, i, j], feat2[b, k, l]>``.

    Equivalent to the reference's bmm-based ``FeatCorrelation('4D')``
    (/root/reference/networks/modules.py:41-53) but as one einsum so XLA
    maps it straight onto the MXU.
    """
    corr = jnp.einsum(
        "bijc,bklc->bijkl", feat1, feat2, preferred_element_type=jnp.float32
    )
    return corr


def mutual_matching(corr: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Soft mutual-nearest-neighbour gating of a correlation volume.

    ``corr`` is ``(B, h1, w1, h2, w2)``. Returns
    ``corr * (corr / max_A corr) * (corr / max_B corr)`` where ``max_A``
    reduces over the (h1, w1) axes and ``max_B`` over (h2, w2) — the
    formula of the reference ``MutualMatching``
    (/root/reference/networks/ncn/model.py:157-176).

    Reductions run on the flat ``(B, na, nb)`` matrix view — plain
    row/column maxes that XLA lowers efficiently, instead of
    multi-axis reductions over the 5D layout.
    """
    b, h1, w1, h2, w2 = corr.shape
    flat = corr.reshape(b, h1 * w1, h2 * w2)
    max_a = jnp.max(flat, axis=1, keepdims=True)  # (B, 1, nb)
    max_b = jnp.max(flat, axis=2, keepdims=True)  # (B, na, 1)
    out = flat * (flat / (max_a + eps)) * (flat / (max_b + eps))
    return out.reshape(corr.shape)


def maxpool4d(corr: jax.Array, ksize: int = 2):
    """4D max-pooling over (h1, w1, h2, w2) with argmax offset decode.

    Args:
      corr: ``(B, h1, w1, h2, w2)`` with every spatial dim divisible by
        ``ksize``.
      ksize: pooling window along each of the 4 dims.

    Returns:
      ``(pooled, (di, dj, dk, dl))`` where ``pooled`` is
      ``(B, h1/k, w1/k, h2/k, w2/k)`` and each ``d*`` is the within-window
      offset (same shape as ``pooled``, int32 in ``[0, ksize)``) of the
      max element — the relocalisation information the reference calls
      ``delta4d`` (/root/reference/networks/modules.py:11-34). The flat
      window index is ``((di*k + dj)*k + dk)*k + dl`` matching the
      reference's slice ordering.
    """
    if ksize == 1:
        z = jnp.zeros(corr.shape, jnp.int32)
        return corr, (z, z, z, z)
    k = ksize

    def pool_axis(x, carried, axis):
        """Strided-slice max over one spatial axis; subsample the
        already-decoded offset arrays alongside. Avoids the 8D
        window transpose entirely (pure elementwise max/select over
        k strided views — layout-friendly on TPU)."""
        views = [
            jax.lax.slice_in_dim(x, i, None, stride=k, axis=axis)
            for i in range(k)
        ]
        best = views[0]
        arg = jnp.zeros(views[0].shape, jnp.int32)
        for i in range(1, k):
            gt = views[i] > best  # strict: first max wins ties,
            best = jnp.where(gt, views[i], best)  # like argmax
            arg = jnp.where(gt, i, arg)
        new_carried = []
        for d in carried:
            dv = [
                jax.lax.slice_in_dim(d, i, None, stride=k, axis=axis)
                for i in range(k)
            ]
            cur = dv[0]
            for i in range(1, k):
                cur = jnp.where(arg == i, dv[i], cur)
            new_carried.append(cur)
        return best, arg, new_carried

    # pool minor-to-major: w2, h2, w1, h1, decoding dl, dk, dj, di
    x, dl, _ = pool_axis(corr, [], 4)
    x, dk, (dl,) = pool_axis(x, (dl,), 3)
    x, dj, (dl, dk) = pool_axis(x, (dl, dk), 2)
    x, di, (dl, dk, dj) = pool_axis(x, (dl, dk, dj), 1)
    return x, (di, dj, dk, dl)


def maxpool4d_values(corr: jax.Array, ksize: int = 2) -> jax.Array:
    """Values-only 4D max-pool (no argmax decode) — the fast path.

    Measured on chip at change_stride scale, :func:`maxpool4d`'s
    offset-carrying minor-axis-first passes cost 88 ms of a 330 ms
    iteration: the stride-k slicing of the LANE axis (w2) is a
    relayout over the full 1.2 GB volume, and the carried int32 offset
    arrays double the traffic. Pooling MAJOR-first shrinks the volume
    4x before any lane-strided access, and the relocalisation offsets
    are not materialised at all — :func:`decode_delta_at` recomputes
    them later for just the few thousand selected cells.

    Identical pooled values (max is order-independent).
    """
    if ksize == 1:
        return corr
    x = corr
    for axis in (1, 2, 3, 4):
        views = [
            jax.lax.slice_in_dim(x, i, None, stride=ksize, axis=axis)
            for i in range(ksize)
        ]
        best = views[0]
        for v in views[1:]:
            best = jnp.maximum(best, v)
        x = best
    return x


def decode_delta_at(
    corr: jax.Array,
    ia: jax.Array, ja: jax.Array, ib: jax.Array, jb: jax.Array,
    ksize: int,
) -> tuple:
    """Within-window argmax offsets for SELECTED pooled cells only.

    corr: the PRE-POOL ``(B, h1, w1, h2, w2)`` volume.
    ia/ja/ib/jb: ``(B, N)`` pooled-grid indices of the cells to decode.
    Returns (di, dj, dk, dl) each ``(B, N)`` int32 — bit-identical to
    gathering :func:`maxpool4d`'s delta4d at those cells: the flat
    argmax of the k^4 window with first-max tie-breaking equals the
    lexicographic (di, dj, dk, dl) tie-break of the sequential
    slice-compare formulation.
    """
    k = ksize
    b, h1, w1, h2, w2 = corr.shape
    n = ia.shape[1]
    # gather whole w2-ROWS (contiguous, lane-friendly — scattered
    # element gathers from the huge flat volume lower pathologically),
    # then pick the k window lanes per row with a tiny take
    rows = corr.reshape(b, h1 * w1 * h2, w2)
    di, dj, dk = jnp.meshgrid(
        jnp.arange(k), jnp.arange(k), jnp.arange(k), indexing="ij"
    )
    di, dj, dk = di.ravel(), dj.ravel(), dk.ravel()  # (k^3,)
    row_idx = (
        ((ia * k)[..., None] + di) * (w1 * h2)
        + ((ja * k)[..., None] + dj) * h2
        + (ib * k)[..., None] + dk
    )  # (B, N, k^3)
    got = jnp.take_along_axis(
        rows, row_idx.reshape(b, n * k**3, 1), axis=1
    ).reshape(b, n, k**3, w2)
    lane = (jb * k)[..., None, None] + jnp.arange(k)[None, None, None, :]
    vals = jnp.take_along_axis(got, lane, axis=3)  # (B, N, k^3, k)
    vals = vals.reshape(b, n, k**4)  # row-major (di, dj, dk, dl)
    arg = jnp.argmax(vals, axis=-1).astype(jnp.int32)  # first max wins
    return (arg // (k**3), (arg // (k**2)) % k, (arg // k) % k, arg % k)
