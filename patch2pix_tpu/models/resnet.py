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

TPU inference detail: when BatchNorm runs on running averages it is a
per-channel affine, so every conv+BN pair is folded into one
convolution with rescaled weights and a bias (``FoldableBatchNorm``).
On TPU, convolutions are library calls that elementwise ops cannot fuse
into, so the unfolded form pays a full HBM read+write pass per BN — at
the change_stride eval scale that was ~3 ms/iteration of pure affine
traffic. Batch-stat mode (``train=True``) keeps the classic form with
flax-BatchNorm-compatible running-stat updates. The variable tree is
identical to nn.BatchNorm's (params scale/bias, batch_stats mean/var),
so checkpoints and the torchvision import are unchanged.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FoldableBatchNorm(nn.Module):
    """BatchNorm with nn.BatchNorm's variable tree plus a
    ``fold_params()`` accessor returning the running-average affine
    ``(s, t)`` with ``bn(y) == y * s + t`` — computed in float32 — so
    callers can fold ``s`` into the preceding convolution's weights."""

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    # NOTE: no dtype field — the eval path computes in x.dtype and the
    # train path in float32, deliberately (running stats are f32).

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.features,)
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )
        self.ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        self.ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )

    def fold_params(self) -> Tuple[jax.Array, jax.Array]:
        s = (
            self.scale.astype(jnp.float32)
            * jax.lax.rsqrt(self.ra_var.value + self.epsilon)
        )
        t = self.bias.astype(jnp.float32) - self.ra_mean.value * s
        return s, t

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if not train:
            s, t = self.fold_params()
            return x * s.astype(x.dtype) + t.astype(x.dtype)
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mu = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mu)
        if not self.is_initializing():
            m = self.momentum
            self.ra_mean.value = m * self.ra_mean.value + (1.0 - m) * mu
            self.ra_var.value = m * self.ra_var.value + (1.0 - m) * var
        inv = jax.lax.rsqrt(var + self.epsilon) * self.scale.astype(jnp.float32)
        y = (xf - mu) * inv + self.bias.astype(jnp.float32)
        return y.astype(x.dtype)


class _ConvKernel(nn.Module):
    """Parameter holder matching nn.Conv's tree (one 'kernel' param)."""

    shape: Tuple[int, ...]

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape
        )

    def __call__(self) -> jax.Array:
        return self.kernel


def _conv2d(x, kernel, stride: int, dtype) -> jax.Array:
    kh = kernel.shape[0]
    p = (kh - 1) // 2
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(stride, stride), padding=[(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_bn(
    x: jax.Array,
    features: int,
    in_features: int,
    ksize: int,
    stride: int,
    conv_name: str,
    bn_name: str,
    dtype,
    train: bool,
) -> jax.Array:
    """conv (no bias) + BatchNorm, BN-folded into the conv at inference.

    Called inside a block's compact method, so ``conv_name``/``bn_name``
    become direct children of the block — the parameter tree matches
    the previous nn.Conv/nn.BatchNorm layout exactly.
    """
    kernel = _ConvKernel(
        (ksize, ksize, in_features, features), name=conv_name
    )()
    bn = FoldableBatchNorm(features, name=bn_name)
    if train:
        return bn(_conv2d(x, kernel, stride, dtype), train=True)
    s, t = bn.fold_params()
    y = _conv2d(x, kernel.astype(jnp.float32) * s, stride, dtype)
    return y + t.astype(y.dtype)


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection shortcut (ResNet-18/34)."""

    filters: int
    in_filters: int
    stride: int = 1
    use_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = _conv_bn(x, self.filters, self.in_filters, 3, self.stride,
                     "conv1", "bn1", self.dtype, train)
        y = nn.relu(y)
        y = _conv_bn(y, self.filters, self.filters, 3, 1,
                     "conv2", "bn2", self.dtype, train)
        if self.use_projection:
            residual = _conv_bn(
                x, self.filters, self.in_filters, 1, self.stride,
                "downsample_conv", "downsample_bn", self.dtype, train,
            )
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck (ResNet-50/101), expansion 4."""

    filters: int
    in_filters: int
    stride: int = 1
    use_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = _conv_bn(x, self.filters, self.in_filters, 1, 1,
                     "conv1", "bn1", self.dtype, train)
        y = nn.relu(y)
        y = _conv_bn(y, self.filters, self.filters, 3, self.stride,
                     "conv2", "bn2", self.dtype, train)
        y = nn.relu(y)
        y = _conv_bn(y, self.filters * 4, self.filters, 1, 1,
                     "conv3", "bn3", self.dtype, train)
        if self.use_projection:
            residual = _conv_bn(
                x, self.filters * 4, self.in_filters, 1, self.stride,
                "downsample_conv", "downsample_bn", self.dtype, train,
            )
        return nn.relu(y + residual)


class StemConv(nn.Module):
    """The 7x7 stride-2 stem convolution, space-to-depth reformulated.

    A direct 7x7/2 conv on a 3-channel image starves the MXU (measured
    ~5 TF/s at 1024x768 — the im2col contraction depth is only
    7*7*3 = 147 and the 3-channel minor dim wastes lanes). Padding the
    kernel to 8x8 with one zero row/column (exact: zero taps contribute
    nothing) makes every tap index even-aligned, so a 2x2
    space-to-depth of the padded image turns the stem into an ordinary
    4x4 stride-1 VALID conv with Cin=12 — same contraction, MXU-tileable
    phase-major input. The parameter keeps the torchvision (7,7,3,64)
    layout so checkpoint import is unchanged; the fold to the s2d
    kernel is a tiny static transform of the weights.

    ``scale``: optional per-output-channel multiplier folded into the
    weights (the BN fold — multiplying the kernel's Cout axis commutes
    with every spatial reshuffle here).

    Falls back to the direct conv for odd input sizes (never hit at the
    snapped eval/train resolutions).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale: jax.Array | None = None):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, 3, 64),
        )
        if scale is not None:
            kernel = kernel.astype(jnp.float32) * scale
        h, w = x.shape[1], x.shape[2]
        if h % 2 or w % 2:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(2, 2), padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # w8[ky, kx] = w7[ky, kx] for ky, kx < 7, zero at index 7;
        # fold only the W taps: wf[ky, bx, px*3 + c, co] = w8[ky, 2bx+px, c, co]
        k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        wf = (
            k8.reshape(8, 4, 2, 3, 64).reshape(8, 4, 6, 64)
        ).astype(self.dtype)
        b = x.shape[0]
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (3, 3), (3, 3), (0, 0)))
        # regroup the trailing (W, C) dims as (W/2, 2*C) — a pure view,
        # no transpose (explicit 2x2 space-to-depth transposes and
        # lane-strided phase slices both lowered as multi-ms relayouts
        # of the image under the layouts XLA picks here); the H-phase
        # stride stays inside the conv, which handles it natively
        xs = xp.reshape(b, h + 6, (w + 6) // 2, 6)
        return jax.lax.conv_general_dilated(
            xs, wf,
            window_strides=(2, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


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
        stem = StemConv(dtype=self.dtype, name="conv1")
        bn1 = FoldableBatchNorm(64, name="bn1")
        if train:
            y = bn1(stem(x), train=True)
        else:
            s, t = bn1.fold_params()
            y = stem(x, scale=s) + t.astype(self.dtype)
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
                    filters=filters, in_filters=in_ch, stride=s,
                    use_projection=proj,
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
