"""VGG16 feature trunk (channels-last Flax) for the NCNet family.

Capability parity with the reference ImMatchNet's VGG16 option
(/root/reference/networks/ncn/model.py:26-37): torchvision's
``vgg16().features`` truncated at a named layer (default ``pool4`` —
stride 16, 512 channels). Layer names follow the reference's
``vgg_feature_layers`` list so ``last_layer`` strings are
interchangeable; torchvision ``features.N.*`` checkpoint keys convert
via :func:`patch2pix_tpu.utils.torch_import.convert_vgg16_features`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# (name, kind, out_channels) mirroring torchvision vgg16().features
# indices 0..30; kind: 'conv' | 'relu' | 'pool'
VGG16_LAYERS: Tuple[Tuple[str, str, int], ...] = (
    ("conv1_1", "conv", 64), ("relu1_1", "relu", 64),
    ("conv1_2", "conv", 64), ("relu1_2", "relu", 64),
    ("pool1", "pool", 64),
    ("conv2_1", "conv", 128), ("relu2_1", "relu", 128),
    ("conv2_2", "conv", 128), ("relu2_2", "relu", 128),
    ("pool2", "pool", 128),
    ("conv3_1", "conv", 256), ("relu3_1", "relu", 256),
    ("conv3_2", "conv", 256), ("relu3_2", "relu", 256),
    ("conv3_3", "conv", 256), ("relu3_3", "relu", 256),
    ("pool3", "pool", 256),
    ("conv4_1", "conv", 512), ("relu4_1", "relu", 512),
    ("conv4_2", "conv", 512), ("relu4_2", "relu", 512),
    ("conv4_3", "conv", 512), ("relu4_3", "relu", 512),
    ("pool4", "pool", 512),
    ("conv5_1", "conv", 512), ("relu5_1", "relu", 512),
    ("conv5_2", "conv", 512), ("relu5_2", "relu", 512),
    ("conv5_3", "conv", 512), ("relu5_3", "relu", 512),
    ("pool5", "pool", 512),
)


class VGG16Features(nn.Module):
    """VGG16 trunk up to ``last_layer`` (inclusive)."""

    last_layer: str = "pool4"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        names = [n for n, _, _ in VGG16_LAYERS]
        if self.last_layer not in names:
            raise ValueError(f"unknown vgg16 layer {self.last_layer!r}")
        stop = names.index(self.last_layer)
        x = x.astype(self.dtype)
        for name, kind, cout in VGG16_LAYERS[: stop + 1]:
            if kind == "conv":
                x = nn.Conv(
                    cout, (3, 3), padding=1, dtype=self.dtype, name=name
                )(x)
            elif kind == "relu":
                x = nn.relu(x)
            else:  # 2x2 max pool, stride 2
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x
