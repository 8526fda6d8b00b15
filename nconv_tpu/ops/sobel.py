"""Sobel gradient ops (NHWC), used by the gradient loss and VOID edge
inpainting (`/root/reference/utils.py:95-122`,
`/root/reference/dataset/voidloader.py:77-97`).

Note the two reference call sites use *opposite sign conventions* for the x
kernel (utils.py has +1..-1 columns, voidloader.py has -1..+1); both are kept
since only the loss's absolute value is sign-invariant, not the edge maps.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .convops import conv2d

# /root/reference/utils.py:99-103 (loss convention)
SOBEL_X_LOSS = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)
SOBEL_Y_LOSS = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32)

# /root/reference/dataset/voidloader.py:77-82 (edge-detection convention)
SOBEL_X_EDGE = -SOBEL_X_LOSS
SOBEL_Y_EDGE = -SOBEL_Y_LOSS


def _sobel(x: jax.Array, k2d: np.ndarray) -> jax.Array:
    ch = x.shape[-1]
    k = jnp.tile(jnp.asarray(k2d, x.dtype)[:, :, None, None], (1, 1, 1, ch))
    # depthwise: the same 3x3 filter per channel
    return conv2d(x, k, padding=1, groups=ch)


def sobel_xy(x: jax.Array, *, convention: str = "loss") -> tuple[jax.Array, jax.Array]:
    """Return (grad_x, grad_y) with zero padding, same spatial size."""
    if convention == "loss":
        kx, ky = SOBEL_X_LOSS, SOBEL_Y_LOSS
    else:
        kx, ky = SOBEL_X_EDGE, SOBEL_Y_EDGE
    return _sobel(x, kx), _sobel(x, ky)


def edge_magnitude(x: jax.Array) -> jax.Array:
    gx, gy = sobel_xy(x, convention="edge")
    return jnp.sqrt(gx * gx + gy * gy)
