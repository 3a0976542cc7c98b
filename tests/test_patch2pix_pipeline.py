"""End-to-end Patch2Pix pipeline: shapes, masks, bounds, gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from patch2pix_tpu.config import ModelConfig, RegressorConfig
from patch2pix_tpu.models import Patch2Pix
from patch2pix_tpu.models.patch2pix import shift_to_anchors, parse_regressor_out


H, W = 64, 96  # tiny images: feature grid 4x6 (stride 16)


def _small_config(**kw):
    return ModelConfig(
        backbone="ResNet34",
        change_stride=kw.get("change_stride", False),
        feat_idx=(0, 1, 2, 3),
        regressor=RegressorConfig(
            conv_dims=(32, 32), conv_kers=(3, 3), conv_strs=(2, 1),
            fc_dims=(32, 16), psize=(16, 16), pshift=8,
            panc=kw.get("panc", 8), shared=kw.get("shared", False),
        ),
    ).resolved()


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = _small_config()
    model = Patch2Pix(cfg)
    im = jnp.zeros((1, H, W, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "proposal": jax.random.PRNGKey(1)},
        im, im, ksize=2, ptmax=16, train=False,
    )
    return model, variables


def test_train_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(0)
    im1 = jnp.asarray(rng.standard_normal((2, H, W, 3)), jnp.float32)
    im2 = jnp.asarray(rng.standard_normal((2, H, W, 3)), jnp.float32)
    out, mutated = model.apply(
        variables, im1, im2, ksize=2, ptmax=16, train=True,
        rngs={"proposal": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    n = 16 * 8  # ptmax * panc
    assert out["coarse"].shape == (2, n, 4)
    assert out["mid"].shape == (2, n, 4)
    assert out["fine"].shape == (2, n, 4)
    assert out["mid_probs"].shape == (2, n)
    assert out["fine_probs"].shape == (2, n)
    for k in ("mid_probs", "fine_probs"):
        p = np.asarray(out[k])
        assert (p >= 0).all() and (p <= 1).all()
    # refined coords clamped to image bounds
    f = np.asarray(out["fine"])
    assert f[..., 0].min() >= 0 and f[..., 0].max() <= W
    assert f[..., 1].min() >= 0 and f[..., 1].max() <= H


def test_predict_fine_eval(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(1)
    im1 = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    im2 = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    fine, mid, coarse = model.apply(
        variables, im1, im2, ksize=2, method=Patch2Pix.predict_fine,
    )
    # grid 4x6 pooled 2x3 -> nb = 6; with mutual=True the fine stage
    # keeps only the direction-1 half (direction-2 rows are never valid)
    assert fine.coords.shape == (1, 6, 4)
    assert fine.valid.shape == (1, 6)
    assert bool(fine.valid.any())  # some mutual matches exist
    assert np.isfinite(np.asarray(fine.coords)).all()


def test_predict_coarse_jits(model_and_vars):
    model, variables = model_and_vars
    fn = jax.jit(
        lambda v, a, b: model.apply(v, a, b, ksize=2, method=Patch2Pix.predict_coarse)
    )
    im = jnp.zeros((1, H, W, 3))
    m = fn(variables, im, im)
    assert m.coords.shape[0] == 1 and m.coords.shape[2] == 4


def test_refine_external_matches(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(2)
    im1 = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    im2 = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    ext = jnp.asarray(rng.random((1, 7, 4)) * [W, H, W, H], jnp.float32)
    fine, probs, mid, mid_probs = model.apply(
        variables, im1, im2, ext, method=Patch2Pix.refine_matches,
    )
    assert fine.shape == (1, 7, 4)
    assert probs.shape == (1, 7)
    # refinement moves each endpoint at most psize/2 + psize/2 per stage
    assert np.abs(np.asarray(fine) - np.asarray(ext)).max() <= 16.0


def test_gradients_flow_to_trainable_params(model_and_vars):
    model, variables = model_and_vars
    im = jnp.asarray(np.random.default_rng(3).standard_normal((1, H, W, 3)),
                     jnp.float32)

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            im, im, ksize=2, ptmax=8, train=False,
            rngs={"proposal": jax.random.PRNGKey(0)},
        )
        return jnp.mean(out["fine_probs"]) + jnp.mean(out["fine"])

    grads = jax.grad(loss_fn)(variables["params"])
    g_mid = jax.tree_util.tree_leaves(grads["regress_mid"])
    g_fine = jax.tree_util.tree_leaves(grads["regress_fine"])
    assert any(float(jnp.abs(g).max()) > 0 for g in g_mid)
    assert any(float(jnp.abs(g).max()) > 0 for g in g_fine)
    # NCN receives no gradient from the cls/epi losses: matches are
    # argmax grid locations (non-differentiable), exactly as in the
    # reference (which sets freeze_nc=True, train_patch2pix.py:301,
    # and relies on the IVD-pretrained NCN).
    g_ncn = jax.tree_util.tree_leaves(grads["ncn"])
    assert all(float(jnp.abs(g).max()) == 0 for g in g_ncn)


def test_shift_to_anchors():
    coords = jnp.asarray([[[100.0, 50.0, 80.0, 40.0]]])
    out = np.asarray(shift_to_anchors(coords, pshift=8, panc=8))
    assert out.shape == (1, 8, 4)
    # first 4 anchors move pt1 corners, pt2 unchanged
    np.testing.assert_array_equal(out[0, 0], [92, 42, 80, 40])
    np.testing.assert_array_equal(out[0, 3], [108, 58, 80, 40])
    np.testing.assert_array_equal(out[0, 4], [100, 50, 72, 32])
    np.testing.assert_array_equal(out[0, 7], [100, 50, 88, 48])
    # panc=1 is identity
    same = shift_to_anchors(coords, pshift=8, panc=1)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(coords))


def test_parse_regressor_out_offsets():
    out = jnp.asarray([[[10.0, -10.0, 0.0, 0.5, 0.0]]])  # (1,1,5)
    coords = jnp.asarray([[[50.0, 50.0, 50.0, 50.0]]])
    m, p = parse_regressor_out(out, coords, psize=16, ptype="center",
                               bounds=(100, 100, 100, 100))
    m = np.asarray(m)[0, 0]
    # tanh(relu(10)) ~ 1 -> offset ~ 16-8 = +8 ; relu(-10)=0 -> offset -8
    assert abs(m[0] - 58.0) < 0.1
    assert abs(m[1] - 42.0) < 1e-5
    assert abs(m[2] - 42.0) < 1e-5  # relu(0)=0 -> -8
    assert abs(float(p[0, 0]) - 0.5) < 1e-6  # sigmoid(0)


def test_fine_cap_exact_when_not_binding(rng):
    """predict_fine(fine_cap=K) == uncapped on the valid set whenever
    the pair has <= K valid coarse matches (score-ranked compaction)."""
    import jax
    import jax.numpy as jnp

    from patch2pix_tpu.config import ModelConfig
    from patch2pix_tpu.models.patch2pix import Patch2Pix

    model = Patch2Pix(config=ModelConfig().resolved())
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    im = jnp.asarray(rng.standard_normal((1, 96, 128, 3)), jnp.float32)
    im2 = jnp.asarray(rng.standard_normal((1, 96, 128, 3)), jnp.float32)
    variables = model.init(
        {"params": k1, "proposal": k2}, im, im2, ksize=2, ptmax=8, train=False
    )
    fine0, mid0, cm0 = model.apply(
        variables, im, im2, ksize=2, method=model.predict_fine
    )
    n_valid = int(np.sum(np.asarray(cm0.valid)))
    cap = max(n_valid + 3, 8)
    fine1, mid1, cm1 = model.apply(
        variables, im, im2, ksize=2, fine_cap=cap, method=model.predict_fine
    )
    assert cm1.coords.shape[1] == cap

    def rows(m):
        v = np.asarray(m.valid[0])
        c = np.asarray(m.coords[0])[v]
        s = np.asarray(m.scores[0])[v]
        order = np.lexsort(c.T)
        return c[order], s[order]

    for a, b in zip(rows(cm0), rows(cm1)):
        np.testing.assert_allclose(a, b, atol=1e-5)
    for a, b in zip(rows(fine0), rows(fine1)):
        np.testing.assert_allclose(a, b, atol=1e-4)
