"""DenseNet201 feature trunk (channels-last Flax) for the NCNet family.

Capability parity with the reference ImMatchNet's densenet option
(/root/reference/networks/ncn/model.py:71-77): torchvision's
``densenet201().features`` truncated at ``transition2`` (the
reference keeps ``features.children()[:-4]`` — conv0/norm0/relu0/pool0,
denseblock1, transition1, denseblock2, transition2), i.e. stride 16,
256 channels. Module names mirror torchvision's state-dict keys
(``denseblock1.denselayer1.norm1`` ...) so conversion is a pure
layout transpose via
:func:`patch2pix_tpu.utils.torch_import.convert_densenet_features`.

TPU notes: dense connectivity is expressed as an explicit channel
concat per layer — XLA fuses the BN/ReLU prologues into the 1x1
bottleneck convs, and the concats are layout no-ops under NHWC since
each layer only appends ``growth`` trailing channels.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bn(dtype, name, train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class DenseLayer(nn.Module):
    """torchvision ``_DenseLayer``: BN-ReLU-1x1 -> BN-ReLU-3x3, concat."""

    growth: int
    bn_size: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _bn(self.dtype, "norm1", train)(x)
        y = nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(y)
        y = _bn(self.dtype, "norm2", train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNetFeatures(nn.Module):
    """DenseNet trunk up to ``transition2`` (inclusive).

    Defaults are DenseNet201's first two blocks (6, 12 layers,
    growth 32); the deeper blocks are cut off by the reference's
    truncation and never instantiated.
    """

    block_config: Sequence[int] = (6, 12)
    growth: int = 32
    num_init_features: int = 64
    bn_size: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        y = nn.Conv(self.num_init_features, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="conv0")(x)
        y = _bn(self.dtype, "norm0", train)(y)
        y = nn.relu(y)
        # torch MaxPool2d(3, stride=2, padding=1)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        y = nn.max_pool(y, (3, 3), strides=(2, 2))

        ch = self.num_init_features
        for bi, n_layers in enumerate(self.block_config):
            block = f"denseblock{bi + 1}"
            for li in range(n_layers):
                y = DenseLayer(self.growth, self.bn_size, self.dtype,
                               name=f"{block}_denselayer{li + 1}")(y, train)
            ch += n_layers * self.growth
            # transition: BN-ReLU-1x1(ch//2)-avgpool2
            tname = f"transition{bi + 1}"
            y = _bn(self.dtype, f"{tname}_norm", train)(y)
            y = nn.relu(y)
            ch //= 2
            y = nn.Conv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"{tname}_conv")(y)
            y = nn.avg_pool(y, (2, 2), strides=(2, 2))
        return y
