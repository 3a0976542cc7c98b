"""Fixed-shape match extraction vs reference np.unique semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from patch2pix_tpu.ops import (
    corr_to_matches,
    mutual_consistency_mask,
    select_ptmax,
    maxpool4d,
)
from patch2pix_tpu.ops.match_extract import score_threshold_mask, grid_to_pixel
from tests import golden


def _extract_sets(corr, delta4d=None, ksize=1, keep_mutual_only=True):
    """Run the device pipeline and return per-batch sets of surviving rows."""
    b, h1, w1, h2, w2 = corr.shape
    d4 = None if delta4d is None else tuple(jnp.asarray(d) for d in delta4d)
    grid, scores, mutual = corr_to_matches(jnp.asarray(corr), d4, ksize=ksize)
    valid = mutual_consistency_mask(mutual, h2 * w2, keep_mutual_only)
    grid, scores, valid = np.asarray(grid), np.asarray(scores), np.asarray(valid)
    out = []
    for bi in range(b):
        rows = {}
        for n in range(grid.shape[1]):
            if valid[bi, n]:
                rows[tuple(grid[bi, n].tolist())] = scores[bi, n]
        out.append(rows)
    return out


def test_mutual_filter_equals_unique_counts(rng):
    corr = rng.standard_normal((2, 3, 4, 4, 3)).astype(np.float32)
    got = _extract_sets(corr, keep_mutual_only=True)
    want = golden.corr_matches_reference_np(corr)
    for bi in range(2):
        mutual_rows = {k: v for k, v in want[bi].items() if v[1] > 1}
        assert set(got[bi].keys()) == set(mutual_rows.keys())
        for k in got[bi]:
            # score of the kept copy = direction-1 (first occurrence) score
            np.testing.assert_allclose(got[bi][k], mutual_rows[k][2], rtol=1e-5)


def test_nonmutual_filter_equals_unique(rng):
    corr = rng.standard_normal((1, 3, 3, 3, 3)).astype(np.float32)
    got = _extract_sets(corr, keep_mutual_only=False)
    want = golden.corr_matches_reference_np(corr)
    assert set(got[0].keys()) == set(want[0].keys())
    for k in got[0]:
        np.testing.assert_allclose(got[0][k], want[0][k][2], rtol=1e-5)


def test_mutual_filter_with_relocalisation(rng):
    hi = rng.standard_normal((1, 6, 8, 4, 6)).astype(np.float32)
    pooled, deltas = maxpool4d(jnp.asarray(hi), ksize=2)
    pooled_np = np.asarray(pooled)
    deltas_np = tuple(np.asarray(d) for d in deltas)
    got = _extract_sets(pooled_np, deltas_np, ksize=2, keep_mutual_only=True)
    want = golden.corr_matches_reference_np(pooled_np, deltas_np, ksize=2)
    mutual_rows = {k: v for k, v in want[0].items() if v[1] > 1}
    assert set(got[0].keys()) == set(mutual_rows.keys())
    assert len(got[0]) > 0


def test_score_threshold_keep_all_fallback():
    valid = jnp.asarray([[True, True, False]])
    scores = jnp.asarray([[0.1, 0.2, 0.9]])
    # threshold passable: mask filters
    m = score_threshold_mask(valid, scores, 0.15)
    np.testing.assert_array_equal(np.asarray(m), [[False, True, False]])
    # threshold kills everything valid: fall back to the unfiltered mask
    m = score_threshold_mask(valid, scores, 0.5)
    np.testing.assert_array_equal(np.asarray(m), [[True, True, False]])


def test_select_ptmax_cycles_valid_rows(rng):
    coords = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
    scores = jnp.asarray(rng.random((2, 10)).astype(np.float32))
    valid = jnp.asarray(
        [[True, False, True, False, False, False, False, False, False, False],
         [False] * 10]
    )
    out = select_ptmax(jax.random.PRNGKey(0), coords, scores, valid, ptmax=7)
    assert out.coords.shape == (2, 7, 4)
    assert bool(out.valid.all())
    # batch 0: only rows 0 and 2 may appear, each repeated
    c0 = np.asarray(out.coords[0])
    allowed = {tuple(np.asarray(coords[0, i]).tolist()) for i in (0, 2)}
    for r in c0:
        assert tuple(r.tolist()) in allowed
    # both valid rows should appear (7 slots cycling 2 rows)
    assert len({tuple(r.tolist()) for r in c0}) == 2
    # batch 1: no valid rows -> dummy row 0 everywhere (reference :57-59)
    c1 = np.asarray(out.coords[1])
    for r in c1:
        np.testing.assert_array_equal(r, np.asarray(coords[1, 0]))


def test_grid_to_pixel_centering():
    grid = jnp.asarray([[[1, 2, 3, 4]]], dtype=jnp.int32)
    pix = np.asarray(grid_to_pixel(grid, upsample=16, center=True))
    np.testing.assert_array_equal(pix[0, 0], [24.0, 40.0, 56.0, 72.0])
    pix = np.asarray(grid_to_pixel(grid, upsample=8, center=False))
    np.testing.assert_array_equal(pix[0, 0], [8.0, 16.0, 24.0, 32.0])


def test_corr_to_matches_topk_vs_numpy_oracle(rng):
    """corr_to_matches_topk reproduces the reference formulas
    (/root/reference/networks/ncn/extract_ncmatches.py:96-158):
    softmax over the reduced axis, k best per anchor, row ordering
    k-major (default) / anchor-major (inverted), delta4d relocation."""
    from patch2pix_tpu.ops.match_extract import corr_to_matches_topk

    b, h1, w1, h2, w2 = 2, 3, 4, 3, 4
    corr = rng.standard_normal((b, h1, w1, h2, w2)).astype(np.float32)
    k = 3
    for invert in (False, True):
        grid, scores = corr_to_matches_topk(
            jnp.asarray(corr), topk=k, do_softmax=True,
            invert_matching_direction=invert,
        )
        flat = corr.reshape(b, h1 * w1, h2 * w2)
        if invert:
            e = np.exp(flat - flat.max(axis=2, keepdims=True))
            sm = e / e.sum(axis=2, keepdims=True)  # softmax over B cells
            want_rows, want_scores = [], []
            for bi in range(b):
                rows, scs = [], []
                for a in range(h1 * w1):
                    order = np.argsort(-sm[bi, a])[:k]
                    for t in order:
                        rows.append((a % w1, a // w1, t % w2, t // w2))
                        scs.append(sm[bi, a, t])
                want_rows.append(rows)
                want_scores.append(scs)
        else:
            e = np.exp(flat - flat.max(axis=1, keepdims=True))
            sm = e / e.sum(axis=1, keepdims=True)  # softmax over A cells
            want_rows, want_scores = [], []
            for bi in range(b):
                rows = [[] for _ in range(k)]
                scs = [[] for _ in range(k)]
                for t in range(h2 * w2):
                    order = np.argsort(-sm[bi, :, t])[:k]
                    for ki, a in enumerate(order):
                        rows[ki].append((a % w1, a // w1, t % w2, t // w2))
                        scs[ki].append(sm[bi, a, t])
                want_rows.append([r for kr in rows for r in kr])
                want_scores.append([s for ks in scs for s in ks])
        got = np.asarray(grid)
        np.testing.assert_array_equal(
            got, np.asarray(want_rows, np.int32).reshape(got.shape)
        )
        np.testing.assert_allclose(
            np.asarray(scores), np.asarray(want_scores, np.float32).reshape(b, -1),
            rtol=1e-5, atol=1e-6,
        )


def test_corr_to_matches_topk_relocation(rng):
    """delta4d relocation: i*ksize + within-window offset, like
    corr_to_matches."""
    from patch2pix_tpu.ops.match_extract import corr_to_matches_topk

    pre = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 4)).astype(np.float32))
    pooled, delta4d = maxpool4d(pre, ksize=2)
    grid1, s1 = corr_to_matches_topk(pooled, delta4d=delta4d, topk=1, ksize=2)
    # against corr_to_matches' direction-1 rows (same k=1 selection)
    grid_ref, s_ref, _ = corr_to_matches(pooled, delta4d=delta4d, ksize=2)
    nb = 2 * 2
    np.testing.assert_array_equal(np.asarray(grid1), np.asarray(grid_ref[:, :nb]))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s_ref[:, :nb]), rtol=1e-5)
