from .blocks import (
    ConvBlock,
    ConvReLU,
    ConvTransReLU,
    DeconvBlock,
    DeConvFuse,
    ConvGRUCell,
    GNConvGRUCell,
)
from .featurenet import AdaFeatureNet, RedFeatureNet
from .costreg import CostRegNet2D, AdaRedCell, RedCell, scan_regularizer
