"""Cross-chip correlation-volume sharding == the single-device path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from patch2pix_tpu.models.ncn import NeighConsensus
from patch2pix_tpu.ops.correlation import (
    feat_correlation,
    l2_normalize,
    maxpool4d_values,
    mutual_matching,
)
from patch2pix_tpu.ops.match_extract import corr_to_matches
from patch2pix_tpu.parallel.volume_sharding import make_sharded_coarse_matcher


class _FakeModel:
    """Just enough of Patch2Pix for the sharded matcher factory."""

    def __init__(self):
        from patch2pix_tpu.config import ModelConfig

        self.config = ModelConfig()


def reference_coarse(ncn, ncn_params, f1, f2, ksize):
    f1 = l2_normalize(f1, axis=-1)
    f2 = l2_normalize(f2, axis=-1)
    corr = feat_correlation(f1, f2)
    prepool = corr
    corr = maxpool4d_values(corr, ksize)
    corr = mutual_matching(corr)
    corr = ncn.apply({"params": ncn_params}, corr)
    corr = mutual_matching(corr)
    return corr_to_matches(corr, prepool, ksize=ksize)


@pytest.mark.parametrize("n_chips", [2, 4])
def test_sharded_coarse_matches_single_device(rng, n_chips):
    b, h1, w1, c = 2, 8, 12, 16
    h2g, w2g = 8, 12
    ksize = 2
    f1 = jnp.asarray(rng.standard_normal((b, h1, w1, c)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((b, h2g, w2g, c)), jnp.float32)

    ncn = NeighConsensus(kernel_sizes=(3, 3), channels=(16, 1))
    ncn_params = ncn.init(jax.random.PRNGKey(0), jnp.zeros(
        (1, 4, 4, 4, 4), jnp.float32))["params"]

    grid_ref, scores_ref, mut_ref = reference_coarse(
        ncn, ncn_params, f1, f2, ksize
    )

    mesh = Mesh(np.asarray(jax.devices()[:n_chips]), ("cp",))
    model = _FakeModel()
    matcher = make_sharded_coarse_matcher(model, mesh, ksize=ksize)
    variables = {"params": {"ncn": ncn_params}}
    out = matcher(variables, f1, f2)

    from patch2pix_tpu.ops.match_extract import (
        grid_to_pixel,
        mutual_consistency_mask,
        score_threshold_mask,
    )

    nb = (h2g // ksize) * (w2g // ksize)
    valid_ref = mutual_consistency_mask(mut_ref, nb, keep_mutual_only=True)
    valid_ref = score_threshold_mask(valid_ref, scores_ref, 0.0)
    coords_ref = grid_to_pixel(grid_ref, upsample=16, center=True)

    np.testing.assert_array_equal(np.asarray(out.coords), np.asarray(coords_ref))
    np.testing.assert_allclose(
        np.asarray(out.scores), np.asarray(scores_ref), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(valid_ref))
