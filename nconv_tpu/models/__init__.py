"""Model zoo: unguided NConv UNet (step 1) and RGB-guided fusion net (step 2)."""
from .backend import resolve_backend
from .fold import fold_batchnorm_variables, maybe_fold
from .guided import (
    BORDER_LEFT,
    BORDER_TOP,
    FusionResolution0,
    FusionResolutionBlock,
    GuidedDepthNet,
    NewFusionBlock,
    UpCat,
    border_mask,
)
from .layers import (
    Basic2d,
    Basic2dTrans,
    BatchNorm,
    Conv,
    Conv3x3Head,
    ConvBlock,
    ConvTranspose,
    RGBEncoder,
)
from .nconv_layers import NConv2d
from .unguided import CONF_THRESHOLD, NConvUNet, Step1Unguided

__all__ = [
    "resolve_backend",
    "fold_batchnorm_variables",
    "maybe_fold",
    "BORDER_LEFT",
    "BORDER_TOP",
    "FusionResolution0",
    "FusionResolutionBlock",
    "GuidedDepthNet",
    "NewFusionBlock",
    "UpCat",
    "border_mask",
    "Basic2d",
    "Basic2dTrans",
    "BatchNorm",
    "Conv",
    "Conv3x3Head",
    "ConvBlock",
    "ConvTranspose",
    "RGBEncoder",
    "NConv2d",
    "CONF_THRESHOLD",
    "NConvUNet",
    "Step1Unguided",
]
