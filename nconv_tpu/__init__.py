"""nconv-tpu: TPU-native real-time sparse-to-dense depth completion.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
lllllcf/Realtime-Depth-Estimation-Nconv (normalized-convolution depth
completion, Eldesokey et al. arXiv:1811.01791): NHWC layouts, pure-functional
models, fused kernels, pjit data parallelism over device meshes.
"""
from . import ops

__version__ = "0.1.0"

__all__ = ["ops", "__version__"]
