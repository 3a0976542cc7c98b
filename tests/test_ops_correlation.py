"""Ops vs golden numpy implementations: correlation / mutual / maxpool4d / conv4d."""

import numpy as np
import jax
import jax.numpy as jnp

from patch2pix_tpu.ops import (
    l2_normalize,
    feat_correlation,
    mutual_matching,
    maxpool4d,
    conv4d,
)
from patch2pix_tpu.ops.conv4d import conv4d_transpose_symmetric
from tests import golden


def test_l2_normalize(rng):
    x = rng.standard_normal((2, 5, 7, 16)).astype(np.float32)
    got = np.asarray(l2_normalize(jnp.asarray(x), axis=-1))
    want = golden.l2_normalize_np(x, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_feat_correlation(rng):
    f1 = rng.standard_normal((2, 4, 6, 8)).astype(np.float32)
    f2 = rng.standard_normal((2, 5, 7, 8)).astype(np.float32)
    got = np.asarray(feat_correlation(jnp.asarray(f1), jnp.asarray(f2)))
    want = golden.feat_correlation_np(f1, f2)
    assert got.shape == (2, 4, 6, 5, 7)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mutual_matching(rng):
    # post-ReLU-like nonnegative volume as in the pipeline
    corr = np.abs(rng.standard_normal((2, 4, 5, 6, 3))).astype(np.float32)
    got = np.asarray(mutual_matching(jnp.asarray(corr)))
    want = golden.mutual_matching_np(corr)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_maxpool4d(rng):
    corr = rng.standard_normal((1, 4, 4, 6, 4)).astype(np.float32)
    pooled, deltas = maxpool4d(jnp.asarray(corr), ksize=2)
    pooled_np, deltas_np = golden.maxpool4d_np(corr, 2)
    np.testing.assert_allclose(np.asarray(pooled), pooled_np, rtol=1e-6)
    for got_d, want_d in zip(deltas, deltas_np):
        np.testing.assert_array_equal(np.asarray(got_d), want_d)


def test_maxpool4d_ksize1_identity(rng):
    corr = rng.standard_normal((1, 2, 2, 2, 2)).astype(np.float32)
    pooled, deltas = maxpool4d(jnp.asarray(corr), ksize=1)
    np.testing.assert_array_equal(np.asarray(pooled), corr)
    for d in deltas:
        assert np.asarray(d).sum() == 0


def test_conv4d(rng):
    x = rng.standard_normal((2, 4, 5, 4, 6, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 3, 3, 4)).astype(np.float32) * 0.1
    b = rng.standard_normal((4,)).astype(np.float32)
    got = np.asarray(conv4d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    want = golden.conv4d_np(x, w, b)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv4d_no_bias(rng):
    x = rng.standard_normal((1, 3, 3, 3, 3, 1)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 3, 1, 2)).astype(np.float32)
    got = np.asarray(conv4d(jnp.asarray(x), jnp.asarray(w)))
    want = golden.conv4d_np(x, w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv4d_transpose_symmetric(rng):
    """Symmetric branch = conv on the AB-swapped volume, swapped back."""
    x = rng.standard_normal((1, 3, 4, 5, 2, 1)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 3, 1, 2)).astype(np.float32)
    got = np.asarray(conv4d_transpose_symmetric(jnp.asarray(x), jnp.asarray(w)))
    xt = x.transpose(0, 3, 4, 1, 2, 5)
    want = golden.conv4d_np(xt, w).transpose(0, 3, 4, 1, 2, 5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv4d_transpose_symmetric_identity():
    """Weight-permute formulation == transpose-conv-transpose."""
    import numpy as np
    from patch2pix_tpu.ops.conv4d import conv4d, conv4d_transpose_symmetric

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 4, 6, 2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 2, 4)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(4), jnp.float32)
    want = conv4d(x.transpose(0, 3, 4, 1, 2, 5), w, b).transpose(0, 3, 4, 1, 2, 5)
    got = conv4d_transpose_symmetric(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_maxpool4d_values_and_lazy_decode(rng):
    """Values-only pool + per-cell decode == the offset-carrying pool."""
    from patch2pix_tpu.ops.correlation import (
        decode_delta_at,
        maxpool4d,
        maxpool4d_values,
    )

    corr = jnp.asarray(rng.standard_normal((2, 8, 12, 6, 10)), jnp.float32)
    pooled_ref, (di, dj, dk, dl) = maxpool4d(corr, 2)
    pooled = maxpool4d_values(corr, 2)
    np.testing.assert_array_equal(np.asarray(pooled), np.asarray(pooled_ref))

    # decode at every pooled cell and compare against the full deltas
    b = 2
    hp, wp, h2p, w2p = pooled.shape[1:]
    ii, jj, kk, ll = np.meshgrid(
        np.arange(hp), np.arange(wp), np.arange(h2p), np.arange(w2p),
        indexing="ij",
    )
    ia = jnp.asarray(np.tile(ii.ravel(), (b, 1)))
    ja = jnp.asarray(np.tile(jj.ravel(), (b, 1)))
    ib = jnp.asarray(np.tile(kk.ravel(), (b, 1)))
    jb = jnp.asarray(np.tile(ll.ravel(), (b, 1)))
    gdi, gdj, gdk, gdl = decode_delta_at(corr, ia, ja, ib, jb, 2)
    for got, want in ((gdi, di), (gdj, dj), (gdk, dk), (gdl, dl)):
        np.testing.assert_array_equal(
            np.asarray(got).reshape(b, hp, wp, h2p, w2p), np.asarray(want)
        )


def test_maxpool4d_values_with_ties(rng):
    """Tie-breaking: duplicate window values decode to the first
    (lexicographic) position, like the reference's sequential slices."""
    from patch2pix_tpu.ops.correlation import decode_delta_at, maxpool4d

    corr = np.zeros((1, 4, 4, 4, 4), np.float32)
    corr[0, 2, 2, 2, 2] = 5.0
    corr[0, 2, 2, 2, 3] = 5.0  # tie within the same window
    corr[0, 3, 3, 3, 3] = 5.0  # tie in a later window position
    cj = jnp.asarray(corr)
    _, (di, dj, dk, dl) = maxpool4d(cj, 2)
    ia = jnp.asarray([[1]]); ib = jnp.asarray([[1]])
    gdi, gdj, gdk, gdl = decode_delta_at(cj, ia, ia, ib, ib, 2)
    assert (int(gdi[0, 0]), int(gdj[0, 0]), int(gdk[0, 0]), int(gdl[0, 0])) == (
        int(di[0, 1, 1, 1, 1]), int(dj[0, 1, 1, 1, 1]),
        int(dk[0, 1, 1, 1, 1]), int(dl[0, 1, 1, 1, 1]),
    )
