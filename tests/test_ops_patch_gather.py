"""Patch gather vs a literal per-point numpy loop (reference semantics)."""

import numpy as np
import jax.numpy as jnp

from patch2pix_tpu.ops import gather_local_patches
from tests import golden


def _gather_np(feats, points, feat_idx, feats_downsample, psize, ptype):
    """Literal loop implementation of hypercolumn patch gathering."""
    b, n, _ = points.shape
    shift = psize // 2 if ptype == "center" else 0
    dims = sum(feats[j].shape[-1] for j in feat_idx)
    out = np.zeros((b, n, psize, psize, dims), np.float32)
    for bi in range(b):
        for ni in range(n):
            x0, y0 = int(points[bi, ni, 0]), int(points[bi, ni, 1])
            for py in range(psize):
                for px in range(psize):
                    col = []
                    ds = 1
                    for j, fmap in enumerate(feats):
                        ds = ds * feats_downsample[j] if j > 0 else feats_downsample[0]
                        if j not in feat_idx:
                            continue
                        hj, wj = fmap.shape[1], fmap.shape[2]
                        xx = np.clip((x0 + px - shift) // ds, 0, wj - 1)
                        yy = np.clip((y0 + py - shift) // ds, 0, hj - 1)
                        col.append(fmap[bi, yy, xx])
                    v = np.concatenate(col)
                    out[bi, ni, py, px] = golden.l2_normalize_np(v, axis=0)
    return out


def test_gather_local_patches(rng):
    feats_downsample = [1, 2, 2, 2, 2]
    h, w = 32, 48
    dims = [3, 8, 8, 16, 16]
    feats = []
    ds = 1
    for j, c in enumerate(dims):
        ds = ds * feats_downsample[j] if j > 0 else 1
        feats.append(rng.standard_normal((2, h // ds, w // ds, c)).astype(np.float32))
    points = np.stack(
        [rng.integers(0, w, (2, 5)), rng.integers(0, h, (2, 5))], axis=-1
    ).astype(np.float32)

    got = np.asarray(
        gather_local_patches(
            [jnp.asarray(f) for f in feats],
            jnp.asarray(points),
            feat_idx=[0, 1, 2, 3],
            feats_downsample=feats_downsample,
            psize=4,
            ptype="center",
        )
    )
    want = _gather_np(feats, points, [0, 1, 2, 3], feats_downsample, 4, "center")
    assert got.shape == (2, 5, 4, 4, 3 + 8 + 8 + 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gather_clamps_at_borders(rng):
    feats = [rng.standard_normal((1, 8, 8, 4)).astype(np.float32)]
    points = np.array([[[0.0, 0.0], [7.0, 7.0]]], np.float32)
    got = gather_local_patches(
        [jnp.asarray(feats[0])], jnp.asarray(points),
        feat_idx=[0], feats_downsample=[1], psize=4, ptype="center",
    )
    assert np.isfinite(np.asarray(got)).all()


def test_gather_tiled_equals_block_gather(rng):
    """2x2-superblock row-gather == block-slice gather, borders included.

    Uses psize=16 maps whose dims are multiples of psize (the snapped
    eval-size contract) and points spanning interior + all borders,
    for both stride-16 and change_stride pyramids.
    """
    from patch2pix_tpu.ops.patch_gather import gather_local_patches_tiled

    h, w = 64, 96
    dims = [3, 8, 8, 16]
    for feats_downsample in ([1, 2, 2, 2], [1, 2, 2, 1]):
        feats = []
        ds = 1
        for j, c in enumerate(dims):
            ds = ds * feats_downsample[j] if j > 0 else 1
            feats.append(
                rng.standard_normal((2, h // ds, w // ds, c)).astype(np.float32)
            )
        pts = np.stack(
            [rng.integers(0, w, (2, 40)), rng.integers(0, h, (2, 40))], axis=-1
        ).astype(np.float32)
        # force border coverage incl. the clamped corners
        pts[:, :8] = [[0, 0], [w - 1, h - 1], [0, h - 1], [w - 1, 0],
                      [3, 60], [95, 2], [17, 0], [0, 33]]
        args = ([jnp.asarray(f) for f in feats], jnp.asarray(pts),
                [0, 1, 2, 3], feats_downsample, 16, "center")
        want = np.asarray(gather_local_patches(*args))
        got = np.asarray(gather_local_patches_tiled(*args))
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_gather_levels_hybrid_equals_block_gather(rng):
    """The per-level hybrid (flat-lane expansion for skinny channels,
    one-hot MXU expansion otherwise) x inv_norm == the concat+l2norm
    gather, including borders and out-of-image points."""
    from patch2pix_tpu.ops.patch_gather import (
        gather_local_patches_tiled_levels,
    )

    h, w = 64, 96
    dims = [3, 64, 16, 128]
    for feats_downsample in ([1, 2, 2, 2], [1, 2, 2, 1]):
        feats = []
        ds = 1
        for j, c in enumerate(dims):
            ds = ds * feats_downsample[j] if j > 0 else 1
            feats.append(
                rng.standard_normal((2, h // ds, w // ds, c)).astype(np.float32)
            )
        pts = np.stack(
            [rng.integers(0, w, (2, 48)), rng.integers(0, h, (2, 48))], axis=-1
        ).astype(np.float32)
        pts[:, :12] = [[0, 0], [w - 1, h - 1], [0, h - 1], [w - 1, 0],
                       [3, 60], [95, 2], [17, 0], [0, 33],
                       [-5, 10], [w + 9, h + 30], [-40, -40], [10, h + 2]]
        args = ([jnp.asarray(f) for f in feats], jnp.asarray(pts),
                [0, 1, 2, 3], feats_downsample, 16, "center")
        want = np.asarray(gather_local_patches(*args))
        lv, inv = gather_local_patches_tiled_levels(*args)
        got = np.asarray(jnp.concatenate(lv, -1).astype(jnp.float32) * inv)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-7)

        # pre-built padded tiles (the hoisted shared-stage path) must be
        # bit-identical to the build-inside path
        from patch2pix_tpu.ops.patch_gather import make_padded_tiles_levels

        tiles = make_padded_tiles_levels(
            args[0], [0, 1, 2, 3], feats_downsample, 16
        )
        lv2, inv2 = gather_local_patches_tiled_levels(*args, tiles=tiles)
        for a, b in zip(lv, lv2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(inv), np.asarray(inv2))
