"""Import the reference PyTorch Patch2Pix as a black-box oracle.

The reference repo (/root/reference) imports torchvision at module
scope (networks/ncn/model.py:6) but only *uses* it inside the
ImMatchNet feature extractors we never instantiate, and downloads
ImageNet weights in ``ResNet.load_pretrained_`` (networks/resnet.py:159).
Neither torchvision nor network egress exists in this environment, so:

  * a stub ``torchvision.models`` module is registered before import,
  * ``load_pretrained_`` is replaced with a no-op (tests always load
    explicit weight dicts, so the zoo download is irrelevant).

Weights are generated deterministically with numpy (``seeded_state_dict``)
rather than torch RNG so the golden-fixture tests can rebuild the exact
same weights without torch installed (numpy's RandomState streams are
stable across versions; torch's are not guaranteed).
"""

from __future__ import annotations

import sys
import types

import numpy as np

_REF = "/root/reference"


def import_reference():
    """Return the reference ``networks`` package, stubbing torchvision."""
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    import torch

    if not torch.cuda.is_available():
        # NeighConsensus.__init__ hardcodes .cuda()
        # (/root/reference/networks/ncn/model.py:142-143); torch here is
        # CPU-only, so make .cuda() a no-op for the oracle runs
        torch.nn.Module.cuda = lambda self, *a, **k: self
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    import networks.resnet as ref_resnet

    ref_resnet.ResNet.load_pretrained_ = lambda self: None
    import networks.patch2pix as ref_patch2pix

    return ref_patch2pix


def reference_eval_config(change_stride: bool, panc: int = 1):
    """The eval-time config Namespace the reference's ``load_model``
    builds (/root/reference/utils/eval/model_helper.py:28-62)."""
    from argparse import Namespace

    import torch

    return Namespace(
        training=False,
        device=torch.device("cpu"),
        regr_batch=1200,
        backbone="ResNet34",
        feat_idx=[0, 1, 2, 3],
        weights_dict=None,
        change_stride=change_stride,
        regressor_config=Namespace(
            conv_kers=[3, 3],
            conv_dims=[512, 512],
            conv_strs=[2, 1],
            fc_dims=[512, 256],
            feat_comb="pre",
            psize=[16, 16],
            pshift=8,
            panc=panc,
            shared=False,
        ),
    )


def state_dict_shapes(torch_model):
    """Ordered {key: shape} of a torch module's state dict."""
    return {k: tuple(v.shape) for k, v in torch_model.state_dict().items()}


def seeded_state_dict(shapes, seed: int = 0):
    """Deterministic numpy weights for a given {key: shape} map.

    Scales are chosen so activations stay well-conditioned through the
    deep backbone: conv/linear weights get fan-in-scaled gaussians,
    biases small gaussians, BN stats mean~0.1/var~[0.5, 1.5). The
    stream depends only on (sorted key order, shapes, seed).
    """
    rs = np.random.RandomState(seed)
    out = {}
    for key in sorted(shapes):
        shape = shapes[key]
        if key.endswith("num_batches_tracked"):
            out[key] = np.asarray(1, dtype=np.int64)
        elif key.endswith("running_mean"):
            out[key] = (rs.randn(*shape) * 0.1).astype(np.float32)
        elif key.endswith("running_var"):
            out[key] = (rs.rand(*shape) + 0.5).astype(np.float32)
        elif key.endswith(".weight") and len(shape) == 1:  # BN scale
            out[key] = (1.0 + 0.1 * rs.randn(*shape)).astype(np.float32)
        elif len(shape) == 1:  # biases
            out[key] = (rs.randn(*shape) * 0.05).astype(np.float32)
        else:
            fan_in = int(np.prod(shape[1:]))
            std = (2.0 / max(fan_in, 1)) ** 0.5
            out[key] = (rs.randn(*shape) * std).astype(np.float32)
    return out


def load_numpy_state_dict(torch_model, np_sd):
    import torch

    torch_model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in np_sd.items()}
    )


def build_reference_model(change_stride: bool, seed: int = 0, panc: int = 1):
    """Reference Patch2Pix with deterministic numpy weights, eval mode.

    Returns (torch_model, numpy_state_dict).
    """
    ref = import_reference()
    cfg = reference_eval_config(change_stride, panc=panc)
    net = ref.Patch2Pix(cfg)
    sd = seeded_state_dict(state_dict_shapes(net), seed=seed)
    load_numpy_state_dict(net, sd)
    net.eval()
    return net, sd
