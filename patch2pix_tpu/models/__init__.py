from patch2pix_tpu.models.resnet import ResNetFeatures, resnet34, resnet50, resnet101
from patch2pix_tpu.models.ncn import NeighConsensus
from patch2pix_tpu.models.regressor import FeatRegressNet
from patch2pix_tpu.models.patch2pix import Patch2Pix

__all__ = [
    "ResNetFeatures",
    "resnet34",
    "resnet50",
    "resnet101",
    "NeighConsensus",
    "FeatRegressNet",
    "Patch2Pix",
]
