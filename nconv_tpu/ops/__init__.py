"""TPU-native op library: torch-parity NHWC primitives + normalized conv."""
from .convops import (
    conv2d,
    conv_transpose2d,
    torch_conv_kernel_to_hwio,
    torch_convtranspose_kernel_to_hwio,
)
from .nconv import (
    EPS_DEFAULT,
    INIT_FNS,
    POS_FNS,
    kaiming_uniform_init,
    nconv2d,
    poisson_init,
    poisson_kernel_pmf,
    softplus10_inverse,
    xavier_uniform_init,
)
from .pool import max_pool2d, max_pool_pair
from .resize import (
    downscale_bilinear,
    resize_bilinear,
    resize_nearest,
    torch_scaled_size,
)
from .sobel import edge_magnitude, sobel_xy

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "torch_conv_kernel_to_hwio",
    "torch_convtranspose_kernel_to_hwio",
    "EPS_DEFAULT",
    "INIT_FNS",
    "POS_FNS",
    "kaiming_uniform_init",
    "nconv2d",
    "poisson_init",
    "poisson_kernel_pmf",
    "softplus10_inverse",
    "xavier_uniform_init",
    "max_pool2d",
    "max_pool_pair",
    "downscale_bilinear",
    "resize_bilinear",
    "resize_nearest",
    "torch_scaled_size",
    "edge_magnitude",
    "sobel_xy",
]
