"""Flax ResNet feature extractors (channels-last, TPU layout).

Capability parity with /root/reference/networks/resnet.py: a
torchvision-compatible ResNet34/50/101 truncated at layer3 (stride 16)
for matching features, with

  * ``pyramid=True`` returning the hypercolumn levels
    [im, relu(bn1(conv1)), layer1, layer2, layer3] used by the
    regressors (reference ``forward_all``, resnet.py:138-157),
  * ``change_stride`` turning layer3's first-block stride 2 -> 1 so the
    matching grid is stride 8 (reference ``change_stride``,
    resnet.py:169-173),
  * layer4 omitted entirely — the reference always freezes and never
    uses it (/root/reference/networks/patch2pix.py:74-76).

Weights convert 1:1 from torchvision checkpoints via
``patch2pix_tpu.utils.torch_import``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection shortcut (ResNet-18/34)."""

    filters: int
    stride: int = 1
    use_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(1, 1),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(y)
        if self.use_projection:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck (ResNet-50/101), expansion 4."""

    filters: int
    stride: int = 1
    use_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn3")(y)
        if self.use_projection:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetFeatures(nn.Module):
    """ResNet truncated at layer3, returning the matching feature (and
    optionally the full hypercolumn pyramid)."""

    block_cls: type = BasicBlock
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    change_stride: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, pyramid: bool = False):
        x = x.astype(self.dtype)
        feats = [x]
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        feats.append(y)
        # torch MaxPool2d(3, stride=2, padding=1)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        y = nn.max_pool(y, (3, 3), strides=(2, 2))

        expansion = 4 if self.block_cls is Bottleneck else 1
        stage_filters = (64, 128, 256)  # layer4 omitted (unused by the reference)
        in_ch = 64
        for si, (filters, n_blocks) in enumerate(zip(stage_filters, self.stage_sizes)):
            stride = 1 if si == 0 else 2
            if si == 2 and self.change_stride:
                stride = 1
            out_ch = filters * expansion
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                proj = bi == 0 and (s != 1 or in_ch != out_ch)
                y = self.block_cls(
                    filters=filters, stride=s, use_projection=proj,
                    dtype=self.dtype, name=f"layer{si + 1}_{bi}",
                )(y, train=train)
                in_ch = out_ch
            feats.append(y)

        if pyramid:
            return tuple(feats)
        return y


def resnet34(change_stride: bool = False, dtype=jnp.float32) -> ResNetFeatures:
    return ResNetFeatures(BasicBlock, (3, 4, 6), change_stride=change_stride,
                          dtype=dtype)


def resnet50(change_stride: bool = False, dtype=jnp.float32) -> ResNetFeatures:
    return ResNetFeatures(Bottleneck, (3, 4, 6), change_stride=change_stride,
                          dtype=dtype)


def resnet101(change_stride: bool = False, dtype=jnp.float32) -> ResNetFeatures:
    return ResNetFeatures(Bottleneck, (3, 4, 23), change_stride=change_stride,
                          dtype=dtype)


BACKBONES = {"ResNet34": resnet34, "ResNet50": resnet50, "ResNet101": resnet101}
