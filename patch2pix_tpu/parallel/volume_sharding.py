"""Cross-chip sharding of the 4D correlation volume (the CP analogue).

SURVEY.md §5 names the 4D volume O(h1*w1*h2*w2) as the reference's
long-context equivalent: at large image sizes the volume, not the
features, is what outgrows a chip. This module shards the volume's
``h1`` axis over a ``cp`` mesh axis so each chip only ever
materialises ``1/n``-th of it — the ring-attention-style recipe from
the scaling book, with XLA collectives in place of NCCL:

  * correlation: each chip contracts its h1-slice of feat1 against the
    full feat2 — embarrassingly parallel, zero communication,
  * MutualMatching: the target-side max reduces over ALL source cells
    -> one ``pmax`` of the (B, nb) row of local maxima,
  * NeighConsensus: the 4D convs need an h1 halo -> one ``ppermute``
    exchange of 2 edge rows per neighbour before the stack; interior
    validity is restored by slicing one row per conv layer, and global
    edges keep the SAME zero-padding semantics,
  * extraction: the B->A direction's argmax over all source cells is a
    ``pmax`` of local maxima + ``pmin`` of the winning global indices
    (exactly the single-device first-max tie-break, because rows are
    ordered by chip); softmax scores come from a ``psum`` of local
    exp-sums against the global max; relocalisation offsets are
    decoded on the chip that owns the winning source row and combined
    with a ``psum``.

Per-pair communication: O(nb) scalars + 2 h1-halo rows — nothing ever
moves a volume-sized tensor. Output is bit-compatible with the
single-device ``Patch2Pix.coarse_matches`` (parity-tested on the fake
mesh, tests/test_volume_sharding.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from patch2pix_tpu.models.ncn import NeighConsensus
from patch2pix_tpu.ops.correlation import (
    decode_delta_at,
    feat_correlation,
    l2_normalize,
    maxpool4d_values,
)
from patch2pix_tpu.ops.match_extract import (
    Matches,
    grid_to_pixel,
    mutual_consistency_mask,
    score_threshold_mask,
)

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _mutual_matching_sharded(corr: jax.Array, axis: str, eps: float = 1e-5):
    """MutualMatching with the source-axis max reduced over chips."""
    b, h1l, w1, h2, w2 = corr.shape
    flat = corr.reshape(b, h1l * w1, h2 * w2)
    max_a = jax.lax.pmax(jnp.max(flat, axis=1, keepdims=True), axis)
    max_b = jnp.max(flat, axis=2, keepdims=True)
    out = flat * (flat / (max_a + eps)) * (flat / (max_b + eps))
    return out.reshape(corr.shape)


def _exchange_h1_halo(x: jax.Array, halo: int, axis: str) -> jax.Array:
    """Concatenate ``halo`` rows from the h1-neighbour chips (zeros at
    the global edges, preserving SAME zero-padding semantics)."""
    n = jax.lax.axis_size(axis)
    p = jax.lax.axis_index(axis)
    top = x[:, :halo]  # rows this chip sends DOWN to its successor
    bot = x[:, -halo:]  # rows sent UP to its predecessor
    from_prev = jax.lax.ppermute(
        bot, axis, [(i, (i + 1) % n) for i in range(n)]
    )
    from_next = jax.lax.ppermute(
        top, axis, [(i, (i - 1) % n) for i in range(n)]
    )
    zeros = jnp.zeros_like(top)
    from_prev = jnp.where(p == 0, zeros, from_prev)
    from_next = jnp.where(p == n - 1, zeros, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=1)


def _ncn_sharded(ncn: NeighConsensus, params, corr: jax.Array, axis: str):
    """Symmetric NCN over an h1-sharded volume via halo exchange.

    One halo row is exchanged PER LAYER (not once up front): SAME conv
    semantics zero-pad every layer's INPUT at the global boundary, so
    the next layer must see literal zeros beyond the image — a
    pre-extended slab would instead feed it layer-1-evaluated-on-zeros
    (bias+relu != 0) and corrupt the edge rows. Mirrors
    ``NeighConsensus.__call__`` exactly, including the compute/output
    dtype handling.
    """
    from patch2pix_tpu.ops.conv4d import conv4d, conv4d_transpose_symmetric

    n_layers = len(ncn.kernel_sizes)
    weights = [
        (params[f"conv{li}_kernel"], params[f"conv{li}_bias"])
        for li in range(n_layers)
    ]

    import flax.linen as nn

    def stack(x, transpose):
        op = conv4d_transpose_symmetric if transpose else conv4d
        for li, (w, b) in enumerate(weights):
            ext = _exchange_h1_halo(x, 1, axis)
            od = ncn.dtype if li < n_layers - 1 else None
            y = nn.relu(
                op(ext.astype(ncn.dtype), w.astype(ncn.dtype), b, out_dtype=od)
            )
            x = y[:, 1:-1]
        return x

    x = corr[..., None]
    y = stack(x, False) + stack(x, True)
    return y[..., 0].astype(jnp.float32)


def _sharded_coarse(
    ncn: NeighConsensus,
    ncn_params,
    feat1_local: jax.Array,
    feat2: jax.Array,
    ksize: int,
    upsample: int,
    axis: str,
):
    """Per-chip body: returns replicated (grid, scores, mutual) with
    the single-device ``corr_to_matches`` row ordering."""
    n = jax.lax.axis_size(axis)
    p = jax.lax.axis_index(axis)

    f1 = l2_normalize(feat1_local, axis=-1)
    f2 = l2_normalize(feat2, axis=-1)
    corr = feat_correlation(f1, f2)  # (B, h1l, w1, h2, w2)
    prepool = corr
    if ksize > 1:
        corr = maxpool4d_values(corr, ksize)
    corr = _mutual_matching_sharded(corr, axis)
    corr = _ncn_sharded(ncn, ncn_params, corr, axis)
    corr = _mutual_matching_sharded(corr, axis)

    b, h1l, w1, h2, w2 = corr.shape
    nal, nb = h1l * w1, h2 * w2
    na = n * nal
    flat = corr.reshape(b, nal, nb)
    big = jnp.int32(na + 1)

    # ---- direction 2 (A->B), source cells are chip-local ----
    arg2 = jnp.argmax(flat, axis=2)  # (B, nal)
    m2 = jnp.max(flat, axis=2)
    lse2 = jax.scipy.special.logsumexp(flat, axis=2)
    score2_local = jnp.exp(m2 - lse2)

    # ---- direction 1 (B->A), argmax over ALL source cells ----
    lm = jnp.max(flat, axis=1)  # (B, nb) local max over sources
    la = jnp.argmax(flat, axis=1).astype(jnp.int32)
    gmax = jax.lax.pmax(lm, axis)  # (B, nb)
    cand = jnp.where(lm >= gmax, p * nal + la, big)
    arg1 = jax.lax.pmin(cand, axis)  # global first-max index (B, nb)
    # softmax score without materialising anything global:
    # score = exp(max - lse) = 1 / psum(sum(exp(x - gmax)))
    z = jax.lax.psum(jnp.sum(jnp.exp(flat - gmax[:, None, :]), axis=1), axis)
    score1 = 1.0 / z

    # ---- mutual flags (need the full arg2 table) ----
    arg2_full = jax.lax.all_gather(arg2, axis, axis=1).reshape(b, na)
    ids_b = jnp.arange(nb)[None, :]
    ids_a_local = p * nal + jnp.arange(nal)[None, :]
    mutual1 = jnp.take_along_axis(arg2_full, arg1, axis=1) == ids_b
    mutual2_local = jnp.take_along_axis(arg1, arg2, axis=1) == ids_a_local

    # ---- decode 2D grid indices ----
    ia1, ja1 = arg1 // w1, arg1 % w1  # global pooled h1 index
    ib1 = jnp.broadcast_to(ids_b // w2, (b, nb))
    jb1 = jnp.broadcast_to(ids_b % w2, (b, nb))
    ia2g = jnp.broadcast_to(ids_a_local // w1, (b, nal))
    ja2g = jnp.broadcast_to(ids_a_local % w1, (b, nal))
    ib2, jb2 = arg2 // w2, arg2 % w2

    if ksize > 1:
        # relocalisation: decode on the chip owning the source rows
        own1 = (ia1 >= p * h1l) & (ia1 < (p + 1) * h1l)
        d1 = decode_delta_at(
            prepool, jnp.where(own1, ia1 - p * h1l, 0), ja1, ib1, jb1, ksize
        )
        d1 = [jax.lax.psum(jnp.where(own1, d, 0), axis) for d in d1]
        d2 = decode_delta_at(
            prepool, ia2g - p * h1l, ja2g, ib2, jb2, ksize
        )
        ia1 = ia1 * ksize + d1[0]
        ja1 = ja1 * ksize + d1[1]
        ib1 = ib1 * ksize + d1[2]
        jb1 = jb1 * ksize + d1[3]
        ia2 = ia2g * ksize + d2[0]
        ja2 = ja2g * ksize + d2[1]
        ib2 = ib2 * ksize + d2[2]
        jb2 = jb2 * ksize + d2[3]
    else:
        ia2, ja2 = ia2g, ja2g

    gather1 = lambda v: jax.lax.all_gather(v, axis, axis=1).reshape(b, na)
    grid = jnp.stack(
        [
            jnp.concatenate([ja1, gather1(ja2)], axis=1),
            jnp.concatenate([ia1, gather1(ia2)], axis=1),
            jnp.concatenate([jb1, gather1(jb2)], axis=1),
            jnp.concatenate([ib1, gather1(ib2)], axis=1),
        ],
        axis=-1,
    ).astype(jnp.int32)
    scores = jnp.concatenate([score1, gather1(score2_local)], axis=1)
    mutual = jnp.concatenate(
        [mutual1, gather1(mutual2_local.astype(jnp.int32)) > 0], axis=1
    )
    return grid, scores, mutual


def make_sharded_coarse_matcher(
    model,
    mesh: Mesh,
    ksize: int = 2,
    mutual: bool = True,
    ncn_thres: float = 0.0,
    axis: str = "cp",
):
    """Build ``fn(variables, feat1, feat2) -> Matches`` with the
    correlation volume h1-sharded over ``mesh[axis]``.

    feat1/feat2 are the stride-16/8 backbone features ``(B, h1, w1, C)``
    / ``(B, h2g, w2, C)``; ``h1`` must divide evenly into
    ``n_chips * ksize`` blocks. The returned Matches are replicated and
    identical to ``model.coarse_matches`` on one device.
    """
    cfg = model.config
    ncn = NeighConsensus(kernel_sizes=(3, 3), channels=(16, 1),
                         dtype=cfg.compute_dtype)

    def fn(variables, feat1, feat2):
        ncn_params = variables["params"]["ncn"]
        body = partial(
            _sharded_coarse, ncn, ksize=ksize, upsample=cfg.upsample,
            axis=axis,
        )
        grid, scores, mut = shard_map(
            lambda pr, f1, f2: body(pr, feat1_local=f1, feat2=f2),
            mesh=mesh,
            in_specs=(P(), P(None, axis), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(ncn_params, feat1, feat2)
        nb = (feat2.shape[1] // ksize) * (feat2.shape[2] // ksize)
        valid = mutual_consistency_mask(mut, nb, keep_mutual_only=mutual)
        valid = score_threshold_mask(valid, scores, ncn_thres)
        coords = grid_to_pixel(grid, upsample=cfg.upsample, center=True)
        return Matches(coords=coords, scores=scores, valid=valid)

    return fn
