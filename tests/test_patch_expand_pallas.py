"""Fused expand+normalise+scale kernel vs the unfused gather path.

The fused path (ops/patch_expand_pallas.py) must reproduce EXACTLY
``scaled(gather_local_patches_tiled_levels(...))`` from
models/patch2pix.py — same one-hot expansion, same f32 square-sums,
same compute-dtype multiply — with the outputs laid out per
``output_slice_map`` (channel-paired for C=64 levels, per-side
otherwise).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from patch2pix_tpu.ops.patch_expand_pallas import output_slice_map
from patch2pix_tpu.ops.patch_gather import (
    gather_local_patches_tiled_levels,
    gather_scaled_patch_pairs_fused,
    make_padded_tiles_levels,
)

FEAT_IDX = (0, 1, 2, 3)
DS = (1, 2, 2, 2, 2)
PSIZE = 16
# real resnet34 widths: exercises the XLA (C=3), dual-pass (C=64) and
# sliced (C=128) level modes
DIMS = (3, 64, 64, 128, 128)


def _make_feats(rng, h, w, dims=DIMS, dtype=np.float32):
    feats = []
    ds = 1
    for j, c in enumerate(dims):
        ds = ds * DS[j] if j > 0 else 1
        f = rng.standard_normal((2, h // ds, w // ds, c)).astype(np.float32)
        feats.append(jnp.asarray(f, dtype if j > 0 else np.float32))
    return feats


def _unfused(feats1, feats2, coords, dtype, dims=DIMS):
    """The pipeline's existing gather + scale, assembled in the fused
    path's output structure."""
    b, n, _ = coords.shape
    sides = []
    for feats, pts in ((feats1, coords[..., 0:2]), (feats2, coords[..., 2:4])):
        lv, inv = gather_local_patches_tiled_levels(
            feats, pts, FEAT_IDX, DS, PSIZE, ptype="center"
        )
        invc = inv if dtype == jnp.float32 else inv.astype(dtype)
        sides.append([
            (x.astype(dtype) * invc).reshape(b * n, PSIZE, PSIZE, x.shape[-1])
            for x in lv
        ])
    cs = [dims[j] for j in FEAT_IDX]
    smap = output_slice_map([1, 2, 4, 8], cs, PSIZE)
    outs = []
    li = 0
    for sl in smap:
        if len(sl) == 2:  # channel-paired level
            outs.append(jnp.concatenate([sides[0][li], sides[1][li]], -1))
            li += 1
        else:
            off = sl[0][0]
            side = 0 if off < sum(cs) else 1
            outs.append(sides[side][li])
            if side == 1:
                li += 1
    return tuple(outs), smap


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_xla_matches_unfused(rng, dtype):
    h, w = 48, 64
    feats1 = _make_feats(rng, h, w, dtype=dtype)
    feats2 = _make_feats(rng, h, w, dtype=dtype)
    # include border clamps on every side
    coords = np.stack(
        [
            rng.integers(-4, w + 4, (2, 7)),
            rng.integers(-4, h + 4, (2, 7)),
            rng.integers(-4, w + 4, (2, 7)),
            rng.integers(-4, h + 4, (2, 7)),
        ],
        axis=-1,
    ).astype(np.float32)

    want, want_map = _unfused(feats1, feats2, coords, dtype)
    got, got_map = gather_scaled_patch_pairs_fused(
        feats1, feats2, coords, FEAT_IDX, DS, PSIZE, dtype,
        use_pallas=False,
    )
    assert got_map == want_map
    assert len(got) == len(want)
    for g, wnt in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(wnt, np.float32))


def test_fused_pallas_interpret_matches_xla(rng):
    h, w = 32, 32
    feats1 = _make_feats(rng, h, w, dtype=jnp.bfloat16)
    feats2 = _make_feats(rng, h, w, dtype=jnp.bfloat16)
    coords = np.stack(
        [
            rng.integers(0, w, (2, 5)),
            rng.integers(0, h, (2, 5)),
            rng.integers(0, w, (2, 5)),
            rng.integers(0, h, (2, 5)),
        ],
        axis=-1,
    ).astype(np.float32)

    want, _ = gather_scaled_patch_pairs_fused(
        feats1, feats2, coords, FEAT_IDX, DS, PSIZE, jnp.bfloat16,
        use_pallas=False,
    )
    got, _ = gather_scaled_patch_pairs_fused(
        feats1, feats2, coords, FEAT_IDX, DS, PSIZE, jnp.bfloat16,
        use_pallas=True, interpret=True,
    )
    for g, wnt in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(wnt, np.float32))


def test_fused_with_shared_tiles(rng):
    """Pre-built hoisted tiles give the same rows as in-call builds."""
    h, w = 48, 64
    feats1 = _make_feats(rng, h, w)
    feats2 = _make_feats(rng, h, w)
    coords = np.stack(
        [
            rng.integers(0, w, (2, 4)),
            rng.integers(0, h, (2, 4)),
            rng.integers(0, w, (2, 4)),
            rng.integers(0, h, (2, 4)),
        ],
        axis=-1,
    ).astype(np.float32)
    t1 = make_padded_tiles_levels(feats1, FEAT_IDX, DS, PSIZE)
    t2 = make_padded_tiles_levels(feats2, FEAT_IDX, DS, PSIZE)
    a, _ = gather_scaled_patch_pairs_fused(
        feats1, feats2, coords, FEAT_IDX, DS, PSIZE, jnp.float32,
        use_pallas=False,
    )
    b, _ = gather_scaled_patch_pairs_fused(
        feats1, feats2, coords, FEAT_IDX, DS, PSIZE, jnp.float32,
        tiles1=t1, tiles2=t2, use_pallas=False,
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fused_pallas_grad_matches_xla(rng):
    """The custom VJP (XLA replay) equals differentiating the XLA path."""
    h, w = 32, 32
    feats1 = _make_feats(rng, h, w)
    feats2 = _make_feats(rng, h, w)
    coords = jnp.asarray(
        np.stack(
            [
                rng.integers(0, w, (2, 3)),
                rng.integers(0, h, (2, 3)),
                rng.integers(0, w, (2, 3)),
                rng.integers(0, h, (2, 3)),
            ],
            axis=-1,
        ).astype(np.float32)
    )

    def loss(feats1, use_pallas):
        outs, _ = gather_scaled_patch_pairs_fused(
            feats1, feats2, coords, FEAT_IDX, DS, PSIZE, jnp.float32,
            use_pallas=use_pallas, interpret=True,
        )
        return sum(jnp.sum(o * o) for o in outs)

    g_xla = jax.grad(lambda f: loss(f, False))(feats1)
    g_pl = jax.grad(lambda f: loss(f, True))(feats1)
    for a, b in zip(g_xla, g_pl):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_fused_pallas_interpret_feat_idx_1234(rng):
    """feat_idx (1,2,3,4): exercises the C=256 sliced mode and the
    t=1 (ds=16) edge. Verified bit-exact on the real chip as well."""
    h, w = 32, 32
    dims = (3, 64, 64, 128, 256)
    feats1 = _make_feats(rng, h, w, dims=dims, dtype=jnp.bfloat16)
    feats2 = _make_feats(rng, h, w, dims=dims, dtype=jnp.bfloat16)
    coords = np.stack(
        [
            rng.integers(0, w, (2, 5)),
            rng.integers(0, h, (2, 5)),
            rng.integers(0, w, (2, 5)),
            rng.integers(0, h, (2, 5)),
        ],
        axis=-1,
    ).astype(np.float32)
    fidx = (1, 2, 3, 4)
    want, _ = gather_scaled_patch_pairs_fused(
        feats1, feats2, coords, fidx, DS, PSIZE, jnp.bfloat16,
        use_pallas=False,
    )
    got, _ = gather_scaled_patch_pairs_fused(
        feats1, feats2, coords, fidx, DS, PSIZE, jnp.bfloat16,
        use_pallas=True, interpret=True,
    )
    for g, wnt in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(wnt, np.float32))
