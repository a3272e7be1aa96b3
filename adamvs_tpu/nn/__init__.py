from .blocks import (
    ConvBlock,
    ConvReLU,
    ConvTransReLU,
    DeconvBlock,
    DeConvFuse,
    ConvGRUCell,
    GNConvGRUCell,
)
from .extras import (
    ConvBn3D,
    ConvBnReLU3D,
    ConvGn,
    ConvGnReLU,
    ConvLSTMCell,
    ConvTransGnReLU,
    DeformConvBlock,
    DeformConvGnReLU,
)
from .featurenet import AdaFeatureNet, RedFeatureNet
from .costreg import CostRegNet2D, AdaRedCell, RedCell, scan_regularizer
