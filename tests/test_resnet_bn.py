"""FoldableBatchNorm: variable-tree and numerical parity vs nn.BatchNorm.

The backbone folds BN affines into conv weights at inference
(models/resnet.py) — these tests pin (a) that both paths match flax's
BatchNorm semantics, (b) that folding conv+BN equals conv-then-BN, and
(c) that the parameter tree still matches what torch_import writes.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from patch2pix_tpu.models.resnet import FoldableBatchNorm, resnet34


def _flax_bn(features):
    return nn.BatchNorm(
        use_running_average=False, momentum=0.9, epsilon=1e-5
    )


def test_eval_path_matches_flax_batchnorm(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 7, 8)), jnp.float32)
    mod = FoldableBatchNorm(8)
    ref = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    variables = {
        "params": {
            "scale": jnp.asarray(rng.uniform(0.5, 2.0, 8), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(8), jnp.float32),
        },
        "batch_stats": {
            "mean": jnp.asarray(rng.standard_normal(8), jnp.float32),
            "var": jnp.asarray(rng.uniform(0.2, 3.0, 8), jnp.float32),
        },
    }
    got = mod.apply(variables, x, train=False)
    want = ref.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)


def test_train_path_matches_flax_batchnorm(rng):
    x = jnp.asarray(rng.standard_normal((4, 3, 3, 6)), jnp.float32)
    variables = {
        "params": {
            "scale": jnp.asarray(rng.uniform(0.5, 2.0, 6), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(6), jnp.float32),
        },
        "batch_stats": {
            "mean": jnp.asarray(rng.standard_normal(6), jnp.float32),
            "var": jnp.asarray(rng.uniform(0.2, 3.0, 6), jnp.float32),
        },
    }
    mod = FoldableBatchNorm(6)
    got, upd = mod.apply(variables, x, train=True, mutable=["batch_stats"])
    ref = _flax_bn(6)
    want, upd_ref = ref.apply(variables, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(upd["batch_stats"][k]),
            np.asarray(upd_ref["batch_stats"][k]),
            rtol=2e-5, atol=2e-5,
        )


def test_backbone_fold_matches_unfolded_conv_then_affine(rng, monkeypatch):
    """Folded inference == unfolded conv-then-affine on realistic stats.

    The reference path runs every conv UNFOLDED and applies the BN as
    the explicit post-conv affine from fold_params (conv(x, W)*s + t);
    the production path folds s into the kernel (conv(x, W*s) + t).
    Equal by linearity — this pins the fold numerically through the
    whole backbone, stem included.
    """
    import patch2pix_tpu.models.resnet as R

    model = resnet34()
    im = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), im)
    # give the running stats non-trivial values
    stats = jax.tree.map(
        lambda v: v + 0.1 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape) / v.size
        if v.ndim == 1 else v,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    folded = model.apply(variables, im, train=False)

    def unfolded_conv_bn(x, features, in_features, ksize, stride,
                         conv_name, bn_name, dtype, train):
        assert not train
        kernel = R._ConvKernel(
            (ksize, ksize, in_features, features), name=conv_name
        )()
        bn = R.FoldableBatchNorm(features, name=bn_name)
        return bn(R._conv2d(x, kernel, stride, dtype), train=False)

    orig_stem_call = R.StemConv.__call__

    def stem_post_scale(self, x, scale=None):
        # apply the BN scale AFTER the conv instead of folding it in
        y = orig_stem_call(self, x, scale=None)
        return y if scale is None else y * scale.astype(y.dtype)

    monkeypatch.setattr(R, "_conv_bn", unfolded_conv_bn)
    monkeypatch.setattr(R.StemConv, "__call__", stem_post_scale)
    unfolded = model.apply(variables, im, train=False)
    np.testing.assert_allclose(
        np.asarray(folded), np.asarray(unfolded), rtol=2e-4, atol=2e-4
    )
    assert np.isfinite(np.asarray(folded)).all()


def test_param_tree_layout_unchanged():
    model = resnet34()
    im = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), im)
    p = variables["params"]
    assert p["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert set(p["bn1"]) == {"scale", "bias"}
    assert p["layer1_0"]["conv1"]["kernel"].shape == (3, 3, 64, 64)
    assert set(p["layer1_0"]["bn1"]) == {"scale", "bias"}
    s = variables["batch_stats"]
    assert set(s["layer3_0"]["downsample_bn"]) == {"mean", "var"}
