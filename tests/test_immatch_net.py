"""ImMatchNet (NCNet family, VGG16 backbone) parity + checkpoint surgery.

torchvision is not installed in this environment, so the VGG16 trunk
oracle is rebuilt as a plain ``torch.nn.Sequential`` from the fixed
public architecture (identical layout and state-dict indices to
``torchvision.vgg16().features``); the NCN/correlation stages use the
actual reference modules as black-box oracles.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from patch2pix_tpu.models.immatch_net import ImMatchNet
from patch2pix_tpu.models.vgg import VGG16Features, VGG16_LAYERS
from patch2pix_tpu.utils.torch_import import (
    convert_ncnet_checkpoint,
    convert_vgg16_features,
    merge_variables,
)

torch = pytest.importorskip("torch")


def build_torch_vgg16_features(upto="pool4"):
    """torchvision-vgg16-features layout as a plain Sequential."""
    import torch.nn as tnn

    layers = []
    cin = 3
    for name, kind, cout in VGG16_LAYERS:
        if kind == "conv":
            layers.append(tnn.Conv2d(cin, cout, 3, padding=1))
            cin = cout
        elif kind == "relu":
            layers.append(tnn.ReLU(inplace=False))
        else:
            layers.append(tnn.MaxPool2d(2, 2))
        if name == upto:
            break
    return tnn.Sequential(*layers)


def test_vgg16_trunk_matches_torch():
    gen = torch.Generator().manual_seed(0)
    tm = build_torch_vgg16_features("pool4")
    for p in tm.parameters():
        p.data = torch.randn(p.shape, generator=gen) * 0.05
    tm.eval()
    x = torch.randn(1, 3, 64, 96, generator=gen)
    with torch.no_grad():
        want = tm(x).numpy().transpose(0, 2, 3, 1)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_vgg16_features(sd, prefix="", scope=())
    fm = VGG16Features(last_layer="pool4")
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    init_vars = fm.init(jax.random.PRNGKey(0), xj)
    variables = merge_variables(init_vars, params, {})
    got = np.asarray(fm.apply(variables, xj))
    assert got.shape == want.shape == (1, 4, 6, 512)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_immatch_net_vgg_matches_reference_composition():
    """Full ImMatchNet forward vs the reference pipeline stages run as
    black boxes on the converted weights (NCNet checkpoint surgery)."""
    from tests.ref_loader import import_reference

    import_reference()
    from networks.ncn.model import (
        FeatureCorrelation,
        MutualMatching,
        NeighConsensus,
        featureL2Norm,
    )

    gen = torch.Generator().manual_seed(1)
    trunk = build_torch_vgg16_features("pool4")
    for p in trunk.parameters():
        p.data = torch.randn(p.shape, generator=gen) * 0.05
    trunk.eval()
    ncn_t = NeighConsensus(
        use_cuda=False, kernel_sizes=[3, 3, 3], channels=[10, 10, 1]
    )
    for p in ncn_t.parameters():
        p.data = torch.randn(p.shape, generator=gen) * 0.2

    # the NCNet checkpoint-surgery layout
    sd = {f"FeatureExtraction.model.{k}": v.numpy()
          for k, v in trunk.state_dict().items()}
    sd.update({f"NeighConsensus.{k}": v.numpy()
               for k, v in ncn_t.state_dict().items()})

    imA = torch.randn(1, 3, 64, 96, generator=gen)
    imB = torch.randn(1, 3, 64, 96, generator=gen)
    with torch.no_grad():
        fa = featureL2Norm(trunk(imA))
        fb = featureL2Norm(trunk(imB))
        corr = FeatureCorrelation(shape="4D", normalization=False)(fa, fb)
        corr = MutualMatching(corr)
        corr = ncn_t(corr)
        want = MutualMatching(corr)[:, 0].numpy()

    model = ImMatchNet(feature_extraction_cnn="vgg")
    a = jnp.asarray(imA.numpy().transpose(0, 2, 3, 1))
    b = jnp.asarray(imB.numpy().transpose(0, 2, 3, 1))
    init_vars = model.init(jax.random.PRNGKey(0), a, b)
    params, stats = convert_ncnet_checkpoint(sd)
    variables = merge_variables(init_vars, params, stats)
    got, delta = model.apply(variables, a, b)
    assert delta is None
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-5)


def test_immatch_net_rejects_unknown_backbone():
    model = ImMatchNet(feature_extraction_cnn="mobilenet_v3")
    with pytest.raises(ValueError, match="unsupported"):
        model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)),
        )


def build_torch_densenet_trunk():
    """torchvision ``densenet201().features[:-4]`` layout (conv0..transition2)
    as plain torch modules with identical state-dict keys."""
    from collections import OrderedDict

    import torch.nn as tnn

    class DenseLayer(tnn.Module):
        def __init__(self, cin, growth=32, bn_size=4):
            super().__init__()
            self.norm1 = tnn.BatchNorm2d(cin)
            self.relu1 = tnn.ReLU()
            self.conv1 = tnn.Conv2d(cin, bn_size * growth, 1, bias=False)
            self.norm2 = tnn.BatchNorm2d(bn_size * growth)
            self.relu2 = tnn.ReLU()
            self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3,
                                    padding=1, bias=False)

        def forward(self, x):
            y = self.conv1(self.relu1(self.norm1(x)))
            y = self.conv2(self.relu2(self.norm2(y)))
            return torch.cat([x, y], 1)

    class Transition(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.norm = tnn.BatchNorm2d(cin)
            self.relu = tnn.ReLU()
            self.conv = tnn.Conv2d(cin, cout, 1, bias=False)
            self.pool = tnn.AvgPool2d(2, 2)

        def forward(self, x):
            return self.pool(self.conv(self.relu(self.norm(x))))

    features = tnn.Sequential(OrderedDict([
        ("conv0", tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)),
        ("norm0", tnn.BatchNorm2d(64)),
        ("relu0", tnn.ReLU()),
        ("pool0", tnn.MaxPool2d(3, stride=2, padding=1)),
    ]))
    ch = 64
    for bi, n in enumerate((6, 12)):
        block = tnn.Sequential(OrderedDict(
            [(f"denselayer{li + 1}", DenseLayer(ch + li * 32))
             for li in range(n)]
        ))
        features.add_module(f"denseblock{bi + 1}", block)
        ch += n * 32
        features.add_module(f"transition{bi + 1}", Transition(ch, ch // 2))
        ch //= 2
    return features


def test_densenet_trunk_matches_torch():
    from patch2pix_tpu.models.densenet import DenseNetFeatures
    from patch2pix_tpu.utils.torch_import import convert_densenet_features

    gen = torch.Generator().manual_seed(2)
    tm = build_torch_densenet_trunk()
    for p in tm.parameters():
        p.data = torch.randn(p.shape, generator=gen) * 0.05
    for m in tm.modules():
        if hasattr(m, "running_mean") and m.running_mean is not None:
            m.running_mean.data = torch.randn(
                m.running_mean.shape, generator=gen) * 0.1
            m.running_var.data = 0.5 + torch.rand(
                m.running_var.shape, generator=gen)
    tm.eval()
    x = torch.randn(1, 3, 64, 96, generator=gen)
    with torch.no_grad():
        want = tm(x).numpy().transpose(0, 2, 3, 1)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_densenet_features(sd, prefix="", scope=())
    fm = DenseNetFeatures()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    init_vars = fm.init(jax.random.PRNGKey(0), xj)
    variables = merge_variables(init_vars, params, stats)
    got = np.asarray(fm.apply(variables, xj))
    assert got.shape == want.shape == (1, 4, 6, 256)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_immatch_net_densenet_forward():
    model = ImMatchNet(feature_extraction_cnn="densenet201",
                       ncons_kernel_sizes=(3,), ncons_channels=(1,))
    a = jnp.zeros((1, 32, 48, 3))
    b = jnp.zeros((1, 32, 48, 3))
    variables = model.init(jax.random.PRNGKey(0), a, b)
    corr, delta = model.apply(variables, a, b)
    assert delta is None
    assert corr.shape == (1, 2, 3, 2, 3)
