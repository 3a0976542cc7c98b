"""Numerical parity of flax models + weight converter vs the reference
PyTorch modules (imported from the read-only reference mount and run as
black boxes — behaviour comparison, not translation)."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
torch = pytest.importorskip("torch")

from patch2pix_tpu.models import resnet34, FeatRegressNet, NeighConsensus
from patch2pix_tpu.utils.torch_import import (
    convert_torchvision_resnet,
    convert_patch2pix_state_dict,
    merge_variables,
)


def _randomize_bn_stats(torch_model, gen):
    """Give running stats non-trivial values so conversion is exercised."""
    for m in torch_model.modules():
        if hasattr(m, "running_mean") and m.running_mean is not None:
            m.running_mean.data = torch.randn(
                m.running_mean.shape, generator=gen) * 0.1
            m.running_var.data = torch.rand(
                m.running_var.shape, generator=gen) + 0.5


@pytest.mark.parametrize("change_stride", [False, True])
def test_resnet34_matches_reference(change_stride):
    import networks.resnet as ref_resnet

    gen = torch.Generator().manual_seed(0)
    tm = ref_resnet.ResNet34()
    if change_stride:
        tm.change_stride(target="layer3")
    _randomize_bn_stats(tm, gen)
    tm.eval()

    x = torch.randn(2, 3, 64, 96, generator=gen)
    with torch.no_grad():
        ref_feats = []
        tm.forward_all(x, ref_feats, early_feat=True)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_torchvision_resnet(sd)

    fm = resnet34(change_stride=change_stride)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    init_vars = fm.init(jax.random.PRNGKey(0), xj, train=False, pyramid=True)
    # the converter scopes under 'extract' (full-model layout); the bare
    # backbone has no scope — unwrap, then verify tree compatibility by
    # merging onto a same-shape init
    variables = merge_variables(
        init_vars, params["extract"], stats["extract"]
    )
    feats = fm.apply(variables, xj, train=False, pyramid=True)

    assert len(feats) == len(ref_feats) == 5
    for i, (got, want) in enumerate(zip(feats, ref_feats)):
        want = want.numpy().transpose(0, 2, 3, 1)
        assert got.shape == want.shape, f"level {i}: {got.shape} vs {want.shape}"
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-3, atol=1e-4,
            err_msg=f"pyramid level {i}",
        )


def test_conv4d_matches_reference_torch():
    from networks.ncn.conv4d import conv4d as ref_conv4d
    from patch2pix_tpu.ops import conv4d

    gen = torch.Generator().manual_seed(1)
    data = torch.randn(2, 3, 4, 5, 4, 6, generator=gen)  # (B,C,h1,w1,h2,w2)
    filt = torch.randn(4, 3, 3, 3, 3, 3, generator=gen) * 0.2  # (out,in,k,k,k,k)
    bias = torch.randn(4, generator=gen)
    with torch.no_grad():
        want = ref_conv4d(data, filt, bias=bias, permute_filters=True).numpy()

    x = jnp.asarray(data.numpy().transpose(0, 2, 3, 4, 5, 1))  # channels-last
    w = jnp.asarray(filt.numpy().transpose(2, 3, 4, 5, 1, 0))  # (k,k,k,k,in,out)
    got = np.asarray(conv4d(x, w, jnp.asarray(bias.numpy())))
    np.testing.assert_allclose(
        got.transpose(0, 5, 1, 2, 3, 4), want, rtol=1e-3, atol=1e-4
    )


def test_ncn_symmetric_matches_reference_composition():
    """NeighConsensus == ReLU(conv4d) stack on x plus on x^T, summed."""
    from networks.ncn.conv4d import conv4d as ref_conv4d

    gen = torch.Generator().manual_seed(2)
    corr_t = torch.randn(1, 1, 4, 5, 4, 5, generator=gen)

    ncn = NeighConsensus(kernel_sizes=(3, 3), channels=(8, 1))
    corr_j = jnp.asarray(corr_t[:, 0].numpy())
    variables = ncn.init(jax.random.PRNGKey(0), corr_j)
    got = np.asarray(ncn.apply(variables, corr_j))

    # rebuild with reference conv4d using the same weights
    p = variables["params"]
    w0 = torch.from_numpy(np.asarray(p["conv0_kernel"]).transpose(5, 4, 0, 1, 2, 3).copy())
    b0 = torch.from_numpy(np.asarray(p["conv0_bias"]).copy())
    w1 = torch.from_numpy(np.asarray(p["conv1_kernel"]).transpose(5, 4, 0, 1, 2, 3).copy())
    b1 = torch.from_numpy(np.asarray(p["conv1_bias"]).copy())

    def stack(x):
        x = torch.relu(ref_conv4d(x, w0, bias=b0, permute_filters=True))
        x = torch.relu(ref_conv4d(x, w1, bias=b1, permute_filters=True))
        return x

    with torch.no_grad():
        xt = corr_t.permute(0, 1, 4, 5, 2, 3)
        want = stack(corr_t) + stack(xt).permute(0, 1, 4, 5, 2, 3)
    np.testing.assert_allclose(got, want[:, 0].numpy(), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("feat_comb", ["pre", "post"])
def test_regressor_matches_reference(feat_comb):
    from argparse import Namespace
    import networks.modules as ref_modules

    gen = torch.Generator().manual_seed(3)
    cfg = Namespace(
        conv_strs=[2, 1], conv_dims=[32, 48], conv_kers=[3, 3],
        feat_comb=feat_comb, feat_dim=16, fc_dims=[32, 24],
    )
    tm = ref_modules.FeatRegressNet(cfg, psize=16, out_dim=5)
    _randomize_bn_stats(tm, gen)
    tm.eval()
    f1 = torch.randn(6, 16, 16, 16, generator=gen)  # (N, D, p, p)
    f2 = torch.randn(6, 16, 16, 16, generator=gen)
    with torch.no_grad():
        want = tm(f1, f2).numpy()

    sd = {f"regress_mid.{k}": v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_patch2pix_state_dict(sd)

    fm = FeatRegressNet(
        conv_dims=(32, 48), conv_kers=(3, 3), conv_strs=(2, 1),
        fc_dims=(32, 24), feat_comb=feat_comb, psize=16,
    )
    f1j = jnp.asarray(f1.numpy().transpose(0, 2, 3, 1))
    f2j = jnp.asarray(f2.numpy().transpose(0, 2, 3, 1))
    init_vars = fm.init(jax.random.PRNGKey(0), f1j, f2j, train=False)
    variables = {
        "params": params["regress_mid"],
        "batch_stats": stats["regress_mid"],
    }
    got = np.asarray(fm.apply(variables, f1j, f2j, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
