"""Convert reference PyTorch checkpoints into flax variable trees.

Handles the three checkpoint flavours the reference loads
(/root/reference/utils/train/helper.py:35-61,
/root/reference/networks/patch2pix.py:98-109):

  * full Patch2Pix checkpoints (``patch2pix_pretrained.pth``) — keys
    ``extract.* / ncn.* / regress_mid.* / regress_fine.*``,
  * NCNet-pretrain dicts (``ncn_ivd_5ep.pth``) — a subset of the above;
    converted partially with everything else left at init,
  * torchvision ResNet state dicts (ImageNet init) — keys
    ``conv1.weight / layer1.0.* / ...`` mapped under ``extract``.

Layout conversions:
  * Conv2d ``(out, in, kh, kw)`` -> flax ``(kh, kw, in, out)``,
  * Linear ``(out, in)`` -> ``(in, out)``,
  * BatchNorm weight/bias -> scale/bias, running stats -> batch_stats,
  * Conv4d: the reference *stores its filters pre-permuted* as
    ``(k1, out, in, k2, k3, k4)`` (/root/reference/networks/ncn/conv4d.py:118-120);
    ours are ``(k1, k2, k3, k4, in, out)``.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file into {key: numpy array} (host-side, lazy torch)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().numpy() for k, v in obj.items() if hasattr(v, "numpy")}


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_conv2d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _convert_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _convert_conv4d(w: np.ndarray) -> np.ndarray:
    # stored (k1, out, in, k2, k3, k4) -> (k1, k2, k3, k4, in, out)
    return np.transpose(w, (0, 3, 4, 5, 2, 1))


def _put_bn(params, stats, scope, leaf, v):
    if leaf == "weight":
        _set(params, (*scope, "scale"), v)
    elif leaf == "bias":
        _set(params, (*scope, "bias"), v)
    elif leaf == "running_mean":
        _set(stats, (*scope, "mean"), v)
    elif leaf == "running_var":
        _set(stats, (*scope, "var"), v)
    # num_batches_tracked ignored


def _convert_resnet_keys(
    sd: Mapping[str, np.ndarray], prefix: str, params: dict, stats: dict, scope: Tuple[str, ...]
):
    """Convert torchvision resnet keys (optionally under ``prefix``)."""
    for key, v in sd.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        parts = key.split(".")
        if parts[0] == "fc":
            continue  # classifier head — never used
        if parts[0] == "conv1":
            _set(params, (*scope, "conv1", "kernel"), _convert_conv2d(v))
        elif parts[0] == "bn1":
            _put_bn(params, stats, (*scope, "bn1"), parts[1], v)
        elif parts[0].startswith("layer"):
            lid = parts[0]  # layer1..layer4
            if lid == "layer4":
                continue  # omitted: frozen & unused in the reference
            block = f"{lid}_{parts[1]}"
            rest = parts[2:]
            if rest[0] == "downsample":
                if rest[1] == "0":  # conv
                    _set(params, (*scope, block, "downsample_conv", "kernel"),
                         _convert_conv2d(v))
                else:  # '1' = bn
                    _put_bn(params, stats, (*scope, block, "downsample_bn"),
                            rest[2], v)
            elif rest[0].startswith("conv"):
                _set(params, (*scope, block, rest[0], "kernel"), _convert_conv2d(v))
            elif rest[0].startswith("bn"):
                _put_bn(params, stats, (*scope, block, rest[0]), rest[1], v)


def _convert_ncn_keys(sd, params, scope=("ncn",), prefix="ncn.conv."):
    # reference layer indices: conv.0, conv.2, ... (ReLU at odd indices)
    for key, v in sd.items():
        if not key.startswith(prefix):
            continue
        idx, leaf = key[len(prefix):].split(".")
        li = int(idx) // 2
        if leaf == "weight":
            _set(params, (*scope, f"conv{li}_kernel"), _convert_conv4d(v))
        else:
            _set(params, (*scope, f"conv{li}_bias"), v)


def _convert_regressor_keys(sd, name, params, stats, n_conv=2, n_fc=2):
    """Map reference FeatRegressNet keys (conv.0/1/2/3, fc.0/1/3/4/6)."""
    prefix = name + "."
    for key, v in sd.items():
        if not key.startswith(prefix):
            continue
        parts = key[len(prefix):].split(".")
        seq, idx, leaf = parts[0], int(parts[1]), parts[2]
        if seq == "conv":
            li = idx // 2
            if idx % 2 == 0:  # Conv2d (bias=False)
                _set(params, (name, f"conv{li}", "kernel"), _convert_conv2d(v))
            else:  # BatchNorm2d
                _put_bn(params, stats, (name, f"convbn{li}"), leaf, v)
        elif seq == "fc":
            li = idx // 3
            which = idx % 3
            if li >= n_fc:  # the final Linear at index 3*n_fc
                if leaf == "weight":
                    _set(params, (name, "fc_out", "kernel"), _convert_linear(v))
                else:
                    _set(params, (name, "fc_out", "bias"), v)
            elif which == 0:  # Linear
                if leaf == "weight":
                    _set(params, (name, f"fc{li}", "kernel"), _convert_linear(v))
                else:
                    _set(params, (name, f"fc{li}", "bias"), v)
            elif which == 1:  # BatchNorm1d
                _put_bn(params, stats, (name, f"fcbn{li}"), leaf, v)


def convert_patch2pix_state_dict(
    sd: Mapping[str, np.ndarray],
) -> Tuple[dict, dict]:
    """Full/partial Patch2Pix torch state dict -> (params, batch_stats).

    Only keys present in ``sd`` are emitted; merge over freshly
    initialised variables for partial (NCNet-pretrain) restores — the
    reference's ``strict=False`` path
    (/root/reference/networks/patch2pix.py:103-109).
    """
    params: dict = {}
    stats: dict = {}
    _convert_resnet_keys(sd, "extract.", params, stats, ("extract",))
    _convert_ncn_keys(sd, params)
    _convert_regressor_keys(sd, "regress_mid", params, stats)
    _convert_regressor_keys(sd, "regress_fine", params, stats)
    return params, stats


def convert_vgg16_features(
    sd: Mapping[str, np.ndarray],
    prefix: str = "features.",
    scope: Tuple[str, ...] = ("FeatureExtraction",),
) -> dict:
    """torchvision ``vgg16().features`` keys -> VGG16Features params.

    Keys look like ``features.N.weight``; N indexes the sequential
    layer list, identical to ``patch2pix_tpu.models.vgg.VGG16_LAYERS``
    ordering, so the conv name is looked up positionally.
    """
    from patch2pix_tpu.models.vgg import VGG16_LAYERS

    params: dict = {}
    for key, v in sd.items():
        if not key.startswith(prefix):
            continue
        idx, leaf = key[len(prefix):].split(".")
        name, kind, _ = VGG16_LAYERS[int(idx)]
        if kind != "conv":
            continue
        if leaf == "weight":
            _set(params, (*scope, name, "kernel"), _convert_conv2d(v))
        elif leaf == "bias":
            _set(params, (*scope, name, "bias"), v)
    return params


def convert_densenet_features(
    sd: Mapping[str, np.ndarray],
    prefix: str = "features.",
    scope: Tuple[str, ...] = ("FeatureExtraction",),
) -> Tuple[dict, dict]:
    """torchvision ``densenet201().features`` keys -> DenseNetFeatures.

    Key shapes: ``conv0.weight``, ``norm0.*``,
    ``denseblock{B}.denselayer{L}.{norm1,conv1,norm2,conv2}.*``,
    ``transition{T}.{norm,conv}.*``. Blocks beyond the truncation
    (denseblock3+, norm5) are skipped — the reference cuts the trunk at
    transition2 (/root/reference/networks/ncn/model.py:71-77).
    """
    params: dict = {}
    stats: dict = {}
    for key, v in sd.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        parts = key.split(".")
        if parts[0] in ("denseblock3", "denseblock4", "transition3", "norm5"):
            continue
        if parts[0] == "conv0":
            _set(params, (*scope, "conv0", "kernel"), _convert_conv2d(v))
        elif parts[0] == "norm0":
            _put_bn(params, stats, (*scope, "norm0"), parts[1], v)
        elif parts[0].startswith("denseblock"):
            layer = f"{parts[0]}_{parts[1]}"
            if parts[2].startswith("conv"):
                _set(params, (*scope, layer, parts[2], "kernel"),
                     _convert_conv2d(v))
            else:
                _put_bn(params, stats, (*scope, layer, parts[2]), parts[3], v)
        elif parts[0].startswith("transition"):
            leaf = f"{parts[0]}_{parts[1]}"
            if parts[1] == "conv":
                _set(params, (*scope, leaf, "kernel"), _convert_conv2d(v))
            else:
                _put_bn(params, stats, (*scope, leaf), parts[2], v)
    return params, stats


def convert_ncnet_checkpoint(
    sd: Mapping[str, np.ndarray],
) -> Tuple[dict, dict]:
    """NCNet-family checkpoint -> ImMatchNet (params, batch_stats).

    Handles the reference's checkpoint-surgery layout
    (/root/reference/networks/ncn/model.py:233-271): keys
    ``FeatureExtraction.model.N.*`` (vgg16 trunk; the reference also
    renames legacy 'vgg' keys to 'model') and
    ``NeighConsensus.conv.M.*`` (pre-permuted Conv4d filters).
    """
    sd = {k.replace(".vgg.", ".model."): v for k, v in sd.items()}
    params = convert_vgg16_features(sd, prefix="FeatureExtraction.model.")
    _convert_ncn_keys(
        sd, params, scope=("NeighConsensus",), prefix="NeighConsensus.conv."
    )
    return params, {}


def convert_torchvision_resnet(sd: Mapping[str, np.ndarray]) -> Tuple[dict, dict]:
    """torchvision resnet state dict -> (params, batch_stats) under 'extract'."""
    params: dict = {}
    stats: dict = {}
    _convert_resnet_keys(sd, "", params, stats, ("extract",))
    return params, stats


def merge_variables(init_vars: Mapping, params: dict, stats: dict):
    """Overlay converted (params, batch_stats) onto initialised variables.

    Returns a new variables dict; keys absent from the conversion keep
    their initialised values (partial-restore contract). Raises on
    shape mismatches.
    """
    import jax

    def overlay(base, upd, path=()):
        out = dict(base)
        for k, v in upd.items():
            if k not in base:
                raise KeyError(f"converted key not in model: {'/'.join((*path, k))}")
            if isinstance(v, dict):
                out[k] = overlay(base[k], v, (*path, k))
            else:
                if tuple(base[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {'/'.join((*path, k))}: "
                        f"model {base[k].shape} vs ckpt {v.shape}"
                    )
                out[k] = jax.numpy.asarray(v, dtype=base[k].dtype)
        return out

    new_vars = dict(init_vars)
    if params:
        new_vars["params"] = overlay(init_vars["params"], params)
    if stats:
        new_vars["batch_stats"] = overlay(init_vars.get("batch_stats", {}), stats)
    return new_vars
