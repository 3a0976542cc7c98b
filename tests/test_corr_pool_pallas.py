"""Fused correlation+pool kernel vs the einsum + values-pool reference.

Interpret-mode on CPU checks the math (grid/layout decomposition,
parity sharding, delta recompute); the on-chip layout is driven by
bench.py / the real-TPU verify recipe.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patch2pix_tpu.ops.correlation import (
    decode_delta_at,
    feat_correlation,
    maxpool4d,
    maxpool4d_values,
)
from patch2pix_tpu.ops.corr_pool_pallas import (
    corr_pool_fused,
    corr_pool_supported,
    decode_delta_from_feats,
)


def _feats(key, b, h1, w1, h2, w2, c, dtype=jnp.float32):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    f1 = jax.random.normal(k1, (b, h1, w1, c), dtype)
    f2 = jax.random.normal(k2, (b, h2, w2, c), dtype)
    return f1, f2


@pytest.mark.parametrize(
    "b,h1,w1,h2,w2,c",
    [
        (2, 12, 16, 12, 16, 128),
        (1, 10, 30, 10, 30, 256),  # odd pooled w1 (15), unaligned nbp
        (2, 6, 8, 10, 12, 128),  # asymmetric image sizes
    ],
)
def test_fused_matches_reference(b, h1, w1, h2, w2, c):
    f1, f2 = _feats(0, b, h1, w1, h2, w2, c)
    assert corr_pool_supported(f1, f2, 2, min_prepool_bytes=0)
    ref = maxpool4d_values(feat_correlation(f1, f2), 2)
    got = corr_pool_fused(f1, f2, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_unsupported_shapes_gated():
    f1, f2 = _feats(1, 1, 7, 8, 8, 8, 128)
    assert not corr_pool_supported(f1, f2, 2, min_prepool_bytes=0)  # odd h1
    f1, f2 = _feats(2, 1, 8, 8, 8, 8, 64)
    assert not corr_pool_supported(f1, f2, 2, min_prepool_bytes=0)  # c % 128
    f1, f2 = _feats(3, 1, 8, 8, 8, 8, 128)
    assert not corr_pool_supported(f1, f2, 4, min_prepool_bytes=0)  # ksize
    # size gate: einsum+pool wins below the threshold (measured)
    f1, f2 = _feats(4, 1, 48, 64, 48, 64, 256)  # upsample-16 eval scale
    assert not corr_pool_supported(f1, f2, 2)
    f1, f2 = _feats(5, 1, 96, 128, 96, 128, 256)  # change_stride scale
    assert corr_pool_supported(f1, f2, 2)


def test_decode_delta_from_feats_matches_volume_decode():
    b, h1, w1, h2, w2, c = 2, 12, 16, 10, 8, 128
    f1, f2 = _feats(4, b, h1, w1, h2, w2, c)
    prepool = feat_correlation(f1, f2)
    pooled, deltas = maxpool4d(prepool, 2)

    n = 37
    key = jax.random.PRNGKey(5)
    ks = jax.random.split(key, 4)
    ia = jax.random.randint(ks[0], (b, n), 0, h1 // 2)
    ja = jax.random.randint(ks[1], (b, n), 0, w1 // 2)
    ib = jax.random.randint(ks[2], (b, n), 0, h2 // 2)
    jb = jax.random.randint(ks[3], (b, n), 0, w2 // 2)

    ref = decode_delta_at(prepool, ia, ja, ib, jb, 2)
    got = decode_delta_from_feats(f1, f2, ia, ja, ib, jb, 2)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
    # and both agree with the materialised maxpool4d offsets
    lin_gather = lambda d: jnp.take_along_axis(
        d.reshape(b, -1),
        ((ia * (w1 // 2) + ja) * (h2 // 2) + ib) * (w2 // 2) + jb,
        axis=1,
    )
    for d_vol, g in zip(deltas, got):
        np.testing.assert_array_equal(np.asarray(lin_gather(d_vol)), np.asarray(g))


def test_custom_vjp_matches_reference_grad():
    from patch2pix_tpu.ops.correlation import l2_normalize

    b, h1, w1, h2, w2, c = 1, 8, 8, 8, 8, 128
    f1, f2 = _feats(6, b, h1, w1, h2, w2, c)
    # the kernel always sees L2-normalised features in the pipeline
    f1 = l2_normalize(f1, axis=-1)
    f2 = l2_normalize(f2, axis=-1)

    def loss_fused(f1, f2):
        out = corr_pool_fused(f1, f2, True)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(f1, f2):
        out = maxpool4d_values(feat_correlation(f1, f2), 2)
        return jnp.sum(out * jnp.cos(out))

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(f1, f2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
    for a, r in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4)


def test_pipeline_uses_fused_path_on_cpu_interpret():
    """coarse_corr dispatches to the fused kernel and the feats-tagged
    delta decodes identically to the einsum prepool path."""
    from patch2pix_tpu.config import ModelConfig
    from patch2pix_tpu.models.patch2pix import Patch2Pix
    from patch2pix_tpu.ops.match_extract import corr_to_matches

    model = Patch2Pix(config=ModelConfig(dtype="float32").resolved())
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    im = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(
        {"params": k1, "proposal": k2}, im, im, ksize=2, ptmax=8, train=False
    )

    im1 = jax.random.normal(jax.random.PRNGKey(7), (1, 64, 96, 3), jnp.float32)
    im2 = jax.random.normal(jax.random.PRNGKey(8), (1, 64, 96, 3), jnp.float32)

    def run(mdl, im1, im2):
        f1 = mdl.extract_pyramid(im1)[-1]
        f2 = mdl.extract_pyramid(im2)[-1]
        corr, delta = mdl.coarse_corr(f1, f2, ksize=2)
        return corr, delta, f1, f2

    import patch2pix_tpu.models.patch2pix as p2p_mod

    # test shapes are far below the size gate; force the fused dispatch
    orig = p2p_mod.corr_pool_supported
    try:
        p2p_mod.corr_pool_supported = (
            lambda f1, f2, k: orig(f1, f2, k, min_prepool_bytes=0)
        )
        corr, delta, f1, f2 = model.apply(variables, im1, im2, method=run)
    finally:
        p2p_mod.corr_pool_supported = orig
    assert isinstance(delta, tuple) and delta[0] == "feats"

    # the default path at this scale is the unfused einsum one
    corr_u, delta_u, _, _ = model.apply(variables, im1, im2, method=run)
    assert not isinstance(delta_u, tuple)  # the raw pre-pool volume
    np.testing.assert_allclose(
        np.asarray(corr), np.asarray(corr_u), atol=1e-4
    )
    grid_a, scores_a, mut_a = corr_to_matches(corr, delta, ksize=2)
    grid_b, scores_b, mut_b = corr_to_matches(corr, delta_u, ksize=2)
    np.testing.assert_array_equal(np.asarray(grid_a), np.asarray(grid_b))
    np.testing.assert_allclose(
        np.asarray(scores_a), np.asarray(scores_b), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(mut_a), np.asarray(mut_b))
