"""Standalone ImMatchNet (adapted NCNet) with selectable backbones.

Capability parity with /root/reference/networks/ncn/model.py:215-333:
``FeatureExtraction`` (VGG16-to-pool4, ResNet101-to-layer3 or
DenseNet201-to-transition2, L2 normalisation inside), 4D
``FeatureCorrelation`` (un-normalised),
optional relocalisation max-pool, MutualMatching -> NeighConsensus ->
MutualMatching with arbitrary NCN depth (e.g. [3,3,3]/[10,10,1]).

The regressor-less ResNet34 composition used by the reference's own
eval path (/root/reference/utils/eval/model_helper.py:53-57) remains
``Patch2Pix(config.regressor=None)``; this module exists for
checkpoint-surgery parity with NCNet-family weights
(``ncn_ivd_5ep.pth`` and friends), whose backbone is VGG16.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from patch2pix_tpu.models.densenet import DenseNetFeatures
from patch2pix_tpu.models.ncn import NeighConsensus
from patch2pix_tpu.models.resnet import BACKBONES
from patch2pix_tpu.models.vgg import VGG16Features
from patch2pix_tpu.ops.correlation import (
    feat_correlation,
    l2_normalize,
    maxpool4d,
    mutual_matching,
)


class ImMatchNet(nn.Module):
    """imA, imB -> filtered 4D correlation (+ delta4d when pooling)."""

    feature_extraction_cnn: str = "vgg"
    last_layer: str = ""  # '' = the reference default per backbone
    ncons_kernel_sizes: Sequence[int] = (3, 3, 3)
    ncons_channels: Sequence[int] = (10, 10, 1)
    normalize_features: bool = True
    relocalization_k_size: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cnn = self.feature_extraction_cnn
        if cnn == "vgg":
            self.extract = VGG16Features(
                last_layer=self.last_layer or "pool4", dtype=self.dtype,
                name="FeatureExtraction",
            )
        elif cnn in ("resnet101", "ResNet101", "resnet34", "ResNet34"):
            key = "ResNet101" if "101" in cnn else "ResNet34"
            # reference default last_layer='layer3' == our early_feat trunk
            self.extract = BACKBONES[key](False, dtype=self.dtype)
        elif cnn == "densenet201":
            # reference truncates at transition2 (model.py:71-77)
            self.extract = DenseNetFeatures(
                dtype=self.dtype, name="FeatureExtraction"
            )
        else:
            raise ValueError(
                f"unsupported feature_extraction_cnn {cnn!r}; "
                "available: vgg, resnet101, resnet34, densenet201"
            )
        self.ncn = NeighConsensus(
            kernel_sizes=tuple(self.ncons_kernel_sizes),
            channels=tuple(self.ncons_channels),
            dtype=self.dtype,
            name="NeighConsensus",
        )

    def features(self, im: jax.Array) -> jax.Array:
        f = self.extract(im)
        if self.normalize_features:
            f = l2_normalize(f, axis=-1)
        return f

    def __call__(
        self, imA: jax.Array, imB: jax.Array
    ) -> Tuple[jax.Array, Optional[Tuple]]:
        return self._match(self.features(imA), self.features(imB))

    def forward_feat(
        self, featA: jax.Array, featB: jax.Array, normalize: bool = True
    ) -> Tuple[jax.Array, Optional[Tuple]]:
        """Match from precomputed (channels-last) feature maps — the
        reference's ``forward_feat`` (model.py:310-333)."""
        if normalize:
            featA = l2_normalize(featA, axis=-1)
            featB = l2_normalize(featB, axis=-1)
        return self._match(featA, featB)

    def _match(self, fa, fb):
        corr = feat_correlation(fa, fb)
        delta4d = None
        if self.relocalization_k_size > 1:
            corr, delta4d = maxpool4d(corr, self.relocalization_k_size)
        corr = mutual_matching(corr)
        corr = self.ncn(corr)
        corr = mutual_matching(corr)
        return corr, delta4d
