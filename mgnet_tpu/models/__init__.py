from mgnet_tpu.models.abn import ABN, ConvABN
from mgnet_tpu.models.layers import (
    AttentionRefinementModule,
    FeatureFusionModule,
    GlobalContextModule,
    MGNetDecoder,
    MGNetHead,
    PoseCNN,
)
from mgnet_tpu.models.mgnet import (
    DepthHead,
    InsEmbedHead,
    MGNet,
    SemSegHead,
    build_model,
)
from mgnet_tpu.models.resnet import BasicBlock, BasicStem, ResNetABN

__all__ = [
    "ABN", "ConvABN", "ResNetABN", "BasicBlock", "BasicStem",
    "GlobalContextModule", "AttentionRefinementModule",
    "FeatureFusionModule", "MGNetDecoder", "MGNetHead", "PoseCNN",
    "MGNet", "SemSegHead", "InsEmbedHead", "DepthHead", "build_model",
]
